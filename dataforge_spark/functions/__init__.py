from . import text_analysis, vectors  # noqa: F401
