"""JSON sanitization S5 (SURVEY §2.1).

Reference: ``sanitize_for_json`` (/root/reference/pipeline.py:48-70) and
``clean_dataset_info_for_json`` (/root/reference/main.py:48-77): recursive
NaN/Inf→None, numpy/temporal scalars→plain Python. Driver-side only —
report dicts are tiny."""

from __future__ import annotations

import datetime as _dt
import math
from typing import Any

try:
    import numpy as _np
except Exception:  # pragma: no cover
    _np = None


def sanitize_for_json(obj: Any) -> Any:
    if isinstance(obj, dict):
        return {str(k): sanitize_for_json(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [sanitize_for_json(v) for v in obj]
    if isinstance(obj, float):
        return None if (math.isnan(obj) or math.isinf(obj)) else obj
    if _np is not None:
        if isinstance(obj, _np.integer):
            return int(obj)
        if isinstance(obj, _np.floating):
            f = float(obj)
            return None if (math.isnan(f) or math.isinf(f)) else f
        if isinstance(obj, _np.bool_):
            return bool(obj)
        if isinstance(obj, _np.ndarray):
            return [sanitize_for_json(v) for v in obj.tolist()]
    if isinstance(obj, (_dt.datetime, _dt.date)):
        return obj.isoformat()
    if isinstance(obj, _dt.timedelta):
        return obj.total_seconds()
    return obj
