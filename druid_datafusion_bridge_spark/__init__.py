"""druid_datafusion_bridge_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the *capabilities* of the reference repo
AndreaBozzo/druid-datafusion-bridge (a Rust library that decodes Apache
Druid v9 segments into Arrow and queries them with DataFusion), re-expressed
Spark-first:

- the reference's query surface (scan/project/filter/join/agg/window/sort/
  set-op/scalar functions — delegated to DataFusion in the reference, see
  SURVEY.md §2) is expressed through the Spark DataFrame/SQL API so that
  Catalyst + Tungsten own optimization and execution;
- the reference's native code (Druid segment decode: smoosh archives,
  GenericIndexed dictionaries, compressed columnar ints/longs/doubles —
  reference src/segment/*, src/column/*) becomes a pure-Python PySpark
  DataSource in :mod:`.sources.druid_segment`;
- beyond the reference, large-scale training-data-pipeline operators
  (dedup, similarity search, text analysis, multimodal plumbing) live in
  :mod:`.operators`.

Everything here is built only from public knowledge: the Apache Spark /
PySpark API and the reference repo's observable behavior.
"""

from .session import get_spark
from .catalog import TABLES, load_tables, table

__all__ = ["get_spark", "load_tables", "table", "TABLES"]

__version__ = "0.1.0"
