"""Large-scale training-data pipeline operators: dedup, similarity
search, text analysis, curation (sampling/packing/scrubbing/
decontamination), multimodal column plumbing.

These extend the reference's surface (BASELINE.json north star): the
same engine that answers time-varying-graph snapshot queries also has
to prepare 100 TB-class document/embedding corpora. Everything here is
built-in-DataFrame-first; Python appears only in Arrow-batched Pandas
UDFs where Spark genuinely lacks the operator.
"""
