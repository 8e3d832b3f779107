from . import (  # noqa: F401
    datetime_parsing,
    duplicates,
    encoding,
    missing_values,
    normalization,
    outliers,
    text_cleaning,
    type_conversion,
    typo_fix,
)
