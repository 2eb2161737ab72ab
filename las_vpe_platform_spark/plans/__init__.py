from las_vpe_platform_spark.plans.pipeline import (  # noqa: F401
    COMMANDS,
    BatchExecutor,
    ExecutionPlan,
    Node,
    compile_command,
)
