"""Scalar function inventory (SURVEY.md §2.8, F1-F11) as vectorized
pyarrow.compute kernels over Arrow arrays.

Each function mirrors a scalar the reference applies per value; here they
are batch-vectorized so they can be used inside ``map_batches`` without
Python row loops.  file:line references are into /root/reference.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def strip_non_alphanumeric(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """F1 — remove non-alphanumerics (userCode/lib/utils.py:25-26)."""
    return pc.replace_substring_regex(col, pattern=r"[^a-zA-Z0-9]", replacement="")


def container_safe_name(col: pa.Array | pa.ChunkedArray, max_len: int = 63) -> pa.Array:
    """F2/M5 — ``:`` → ``-`` then truncate (userCode/lib/utils.py:29-41,55-57)."""
    replaced = pc.replace_substring(col, pattern=":", replacement="-")
    return pc.utf8_slice_codeunits(replaced, start=0, stop=max_len)


def trim_id(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """F3 — whitespace strip on ids (userCode/assetGroups/config.py:128)."""
    return pc.utf8_trim_whitespace(col)


def date_tag(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """F4 — timestamp → ``%Y_%m_%d`` artifact tag (userCode/assetGroups/export.py:249)."""
    return pc.strftime(col, format="%Y_%m_%d")


def parse_lastmod(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """F5 — ISO8601 ``lastmod`` → timestamp[us] (sitemap fixture :10)."""
    return pc.strptime(col, format="%Y-%m-%dT%H:%M:%S", unit="us")


def has_content(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """M9 — non-empty object predicate (userCode/lib/classes.py:73-83)."""
    return pc.greater(pc.utf8_length(pc.cast(col, pa.large_string())), 0)


def ends_with_any(col: pa.Array | pa.ChunkedArray, suffixes: tuple[str, ...]) -> pa.Array:
    """F9 — suffix predicates (.nq / .nq.gz / .bytesum file filters,
    userCode/assetGroups/export.py:255-258)."""
    out = pc.ends_with(col, pattern=suffixes[0])
    for s in suffixes[1:]:
        out = pc.or_(out, pc.ends_with(col, pattern=s))
    return out


def format_gb(num_bytes: int) -> str:
    """F8 — bytes → GB display string (userCode/assetGroups/config.py:78-81)."""
    return f"{num_bytes / 1e9:.2f} GB"


def render_config_template(template: str, variables: dict[str, str]) -> str:
    """M7 — strict config templating (the reference renders rclone.conf
    with Jinja2 ``StrictUndefined`` from 8 env vars,
    userCode/lib/utils.py:100-125): every ``{{ name }}`` placeholder must
    resolve or rendering fails fast; unused variables are allowed."""
    import re as _re

    def sub(m: "_re.Match[str]") -> str:
        name = m.group(1).strip()
        if name not in variables:
            raise KeyError(f"undefined template variable: {name}")
        return str(variables[name])

    return _re.sub(r"\{\{([^}]+)\}\}", sub, template)


def env_bool(value: str | None, default: bool = False) -> bool:
    """F10 — env string → bool coercion (userCode/lib/env.py:18-25)."""
    if value is None:
        return default
    return value.strip().lower() in ("1", "true", "yes", "on")


def env_int(value: str | None, default: int = 0) -> int:
    if value is None or not value.strip():
        return default
    return int(value.strip())
