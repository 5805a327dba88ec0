"""mongo_hadoop_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the MongoDB Connector for Hadoop
(reference: llvtt/mongo-hadoop), re-expressed Spark-first.

The reference is a storage/connector layer (splitters, pushdown, type
bridging, bulk writers) plus a set of canonical analytics jobs; all
relational computation was delegated to Hadoop-ecosystem engines.  Here the
engine *is* Spark: DataFrame/SQL plans optimized by Catalyst, a Python
DataSource for document collections with partition planning + filter/
projection pushdown, document-store writers with insert/update/replace/
upsert semantics, a pure-Python BSON codec for `.bson` interchange, and a
library of reference-parity and large-scale data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns).
"""

__version__ = "0.1.0"

from mongo_hadoop_spark.session import get_spark  # noqa: F401
