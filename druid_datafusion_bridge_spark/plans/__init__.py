"""Physical-plan introspection and scale assertions.

The scale discipline in this repo ("filters reach the scan, joins
broadcast or co-locate, no accidental exchanges") is enforceable, not
aspirational: these helpers parse `df.explain` output so tests can
assert plan shape — pushed filters, read schemas, exchange counts,
join strategies. See tests/test_plans.py.
"""

from .inspect import (  # noqa: F401
    count_exchanges,
    count_wholestage_codegen,
    formatted_plan,
    join_strategies,
    pushed_filters,
    read_schemas,
    scan_partition_counts,
)
from .bucketing import write_bucketed  # noqa: F401
