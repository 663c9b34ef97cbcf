from .mesh import (  # noqa: F401
    collective_stats,
    compiled_step_hlo,
    distribution_report,
    make_mesh,
    shard_bsr_tables,
    shard_plan_inputs,
    sort_edges_by_owner,
)
