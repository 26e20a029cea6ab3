from datax_ray.cdc.merge import (  # noqa: F401
    add_partition_column,
    lww_fold_table,
    lww_merge,
    partial_lww_combiner,
    stable_hash_partition,
)
from datax_ray.cdc.cells import (  # noqa: F401
    assemble_cells,
    cell_changelog,
    explode_cells,
)
