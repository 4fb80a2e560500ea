"""Function-compatibility layers (SURVEY.md §2.8).

``druid_sql`` maps Druid SQL's function names onto Spark expressions —
both as Column helpers and as Catalyst-inlined SQL UDFs.
"""

from .druid_sql import (  # noqa: F401
    contains_string,
    decode_base64_utf8,
    div,
    earliest,
    icontains_string,
    latest,
    lookup,
    millis_to_timestamp,
    mv_contains,
    mv_filter_none,
    mv_filter_only,
    mv_length,
    mv_offset,
    mv_ordinal,
    mv_overlap,
    mv_to_string,
    parse_period,
    regexp_like,
    register_druid_sql_functions,
    register_sql_lookups,
    safe_divide,
    string_to_mv,
    textcat,
    time_ceil,
    time_in_interval,
    time_extract,
    time_floor,
    time_format,
    time_parse,
    time_shift,
    timestamp_to_millis,
)
