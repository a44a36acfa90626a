from .validate import (  # noqa: F401
    BatchValidator,
    JsonColumnValidator,
    flatten_violations,
    validate_dataset,
    verdicts_only,
)
from .stats import column_stats  # noqa: F401
from .uniqueness import duplicate_keys, uniqueness_violations  # noqa: F401
from .referential import fk_violations, referential_violations  # noqa: F401
from .drift import DriftReport, compute_histogram, drift_check  # noqa: F401
