"""Structured Streaming layer (SURVEY.md §2.6-2.7).

The reference's poll-loop (kafka/README.md:131-157) is literally
Spark's micro-batch loop; its state-store/changelog recovery
(kafka/README.md:357-358) is the checkpointLocation contract. Queries
here replay the bounded fixture tables through a file source and run the
streaming topology to completion, so results are deterministic and —
for complete-mode aggregations — verifiable against the batch oracle
(stream-batch equivalence, SURVEY.md §5).
"""
