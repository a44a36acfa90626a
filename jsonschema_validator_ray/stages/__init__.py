from .validate import (  # noqa: F401
    BatchValidator,
    JsonColumnValidator,
    flatten_violations,
    validate_dataset,
    verdicts_only,
)
