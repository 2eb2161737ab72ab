"""Relational and pipeline operators (SURVEY §2.3-§2.7).

Each function is a documented ``DataFrame -> DataFrame`` transform that
maps one (or a small family of) reference operators onto Spark
primitives, keeping the plan declarative so Catalyst can choose
physical strategies.
"""

from las_vpe_platform_spark.operators.aggregates import (  # noqa: F401
    completeness_check,
    wide_avg,
)
from las_vpe_platform_spark.operators.joins import (  # noqa: F401
    full_outer_assemble,
    pairwise_similarity_topk,
    point_lookup,
)
from las_vpe_platform_spark.operators.routing import (  # noqa: F401
    demux,
    port_filter,
    term_sig_filter,
)
from las_vpe_platform_spark.operators.sampling import (  # noqa: F401
    even_spaced_sample,
    sample_array_even,
)
from las_vpe_platform_spark.operators.windows import (  # noqa: F401
    last_n,
    topk_per_group,
)
