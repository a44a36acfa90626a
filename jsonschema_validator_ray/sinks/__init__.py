from .resumable import (  # noqa: F401
    Partition,
    completed_partitions,
    partition_input_files,
    run_resumable,
)
