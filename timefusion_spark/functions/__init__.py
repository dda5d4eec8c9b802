"""PG/Timescale-parity scalar function surface (SURVEY §2.9).

Every function here is a native Column expression composition (JVM-side,
whole-stage-codegen'd) — the reference implements these as DataFusion
scalar UDFs in src/functions.rs; Python-side UDFs would be the slow path,
so they are avoided except where noted (jsonpath).
"""

from timefusion_spark.functions.time import (  # noqa: F401
    at_time_zone,
    extract_epoch,
    parse_interval_to_micros,
    time_bucket,
)
from timefusion_spark.functions.pg_format import to_char  # noqa: F401
from timefusion_spark.functions.json_fns import (  # noqa: F401
    json_build_array,
    json_get,
    json_get_text,
    json_to_pg_text,
)
from timefusion_spark.functions.text import text_match  # noqa: F401
from timefusion_spark.functions.register import register_all  # noqa: F401
