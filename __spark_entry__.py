"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query; ``queries()`` exposes every
implemented operator from SURVEY.md §2 (+ the data-pipeline extensions);
``oracle_sql()`` gives the DuckDB-equivalent SQL for each.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# self-locating: works however the driver imports this file (any cwd)
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from mongo_hadoop_spark import operators  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full corpus-preparation pipeline (quality gate
    → exact dedup → benchmark decontamination → content-hash train/valid/
    test split → manifest) as ONE Catalyst plan on sf0.001."""
    from mongo_hadoop_spark.operators.pipeline import corpus_training_manifest

    return corpus_training_manifest(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return operators.all_queries()


def oracle_sql() -> dict[str, str]:
    return operators.all_oracles()
