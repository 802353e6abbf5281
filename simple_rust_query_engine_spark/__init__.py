"""simple_rust_query_engine_spark — a PySpark-native analytics engine
with the capabilities of ``marvinlanhenke/simple-rust-query-engine``
(reference, read-only at /root/reference), re-expressed Spark-first.

Layout:
    session.py     SessionContext facade + SparkSession factory
    dataframe.py   lazy DataFrame facade (select/filter/aggregate/...)
    functions/     expression builders (col/lit/count/sum/avg/min/max)
    sources/       CSV + parquet readers, writers
    operators/     relational operator helpers & query library
    pipeline/      LLM-training-data ops: dedup, similarity, text, multimodal
    plans/         explain/plan inspection helpers
    streaming/     Structured Streaming (beyond parity; reference has none)
"""

from .dataframe import EngineDataFrame
from .session import SessionContext, get_spark, load_tables

__all__ = ["SessionContext", "EngineDataFrame", "get_spark", "load_tables"]
__version__ = "0.1.0"
