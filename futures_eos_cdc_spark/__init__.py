"""futures_eos_cdc_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the query and data-processing
capabilities of the reference streaming-CDC pipeline (ziwon/futures-eos-cdc,
read-only copy at /root/reference/): signal ingestion, 5-minute tumbling
windowed aggregation per symbol, decision scoring, the order/outbox pipeline,
CDC/outbox event routing — plus the general relational operator surface and
large-scale training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) the reference lacks.

Architecture: everything is a composable DataFrame transform (batch first,
streaming shares the same expression layer). No RDDs, no custom Catalyst
rules — logical plans are declared with the DataFrame/SQL API and Catalyst +
Tungsten pick the physical strategy (see SURVEY.md §4).
"""

__version__ = "0.1.0"
