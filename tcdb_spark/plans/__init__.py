"""Query catalog exposed through __spark_entry__.py.

Importing this package populates the registries in
:mod:`tcdb_spark.plans.catalog`.
"""

from tcdb_spark.plans.catalog import QUERIES, ORACLES, load_tables  # noqa: F401

# Registration side effects:
from tcdb_spark.plans import queries_core  # noqa: F401,E402
from tcdb_spark.plans import queries_atcf  # noqa: F401,E402
from tcdb_spark.plans import queries_text  # noqa: F401,E402
from tcdb_spark.plans import queries_sim  # noqa: F401,E402
from tcdb_spark.plans import queries_merge  # noqa: F401,E402
from tcdb_spark.plans import queries_dedup_near  # noqa: F401,E402
from tcdb_spark.plans import queries_multimodal  # noqa: F401,E402
from tcdb_spark.plans import queries_ensemble  # noqa: F401,E402
from tcdb_spark.plans import queries_validation  # noqa: F401,E402
from tcdb_spark.plans import queries_sql  # noqa: F401,E402
from tcdb_spark.plans import queries_analytics  # noqa: F401,E402
from tcdb_spark.plans import queries_joins_windows  # noqa: F401,E402
from tcdb_spark.plans import queries_curation  # noqa: F401,E402
from tcdb_spark.plans import queries_corpus  # noqa: F401,E402
from tcdb_spark.plans import queries_timeseries  # noqa: F401,E402
from tcdb_spark.plans import queries_packing  # noqa: F401,E402
from tcdb_spark.plans import queries_scd  # noqa: F401,E402
from tcdb_spark.plans import queries_tpch  # noqa: F401,E402
from tcdb_spark.plans import queries_tpch2  # noqa: F401,E402
from tcdb_spark.plans import queries_spans  # noqa: F401,E402
from tcdb_spark.plans import queries_ranking  # noqa: F401,E402
from tcdb_spark.plans import queries_chunking  # noqa: F401,E402
from tcdb_spark.plans import queries_training  # noqa: F401,E402
from tcdb_spark.plans import queries_eval  # noqa: F401,E402
from tcdb_spark.plans import queries_stats  # noqa: F401,E402
from tcdb_spark.plans import queries_clustering  # noqa: F401,E402
from tcdb_spark.plans import queries_web  # noqa: F401,E402
from tcdb_spark.plans import queries_privacy  # noqa: F401,E402
