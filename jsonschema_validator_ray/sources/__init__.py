from .webtext import (  # noqa: F401
    extract_text,
    webtext_batch,
    webtext_dataset,
    write_webtext_parquet,
)
