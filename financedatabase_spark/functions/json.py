"""JSON payload codecs — the reference's declared json type mapping
(SURVEY.md §1.3): MySQL ``json`` columns surface as Python dicts
(reference: SQLHelpers.py:61-75 type map, ``json → dict`` at :73), and
the proxy transport wraps every response in a JSON envelope
``{"data": <payload>, ...}`` (reference: v2.py:444-452,
utils.py:548-559).

Spark-first those become `from_json`/`to_json` over ``MapType`` /
``StructType`` columns — native, codegen'd expressions, zero shuffle:

- `parse_payload` — typed read (the schema-known case: order payloads);
- `payload_map`  — schemaless read as ``map<string,string>`` (the
  json→dict case: keys unknown until runtime);
- `render_payload` / `extract_path` — write + ad-hoc path extraction;
- `wrap_envelope` / `unwrap_envelope` — the proxy transport codec; the
  inner payload rides as an escaped JSON string exactly like the
  reference's ``response.json()["data"]``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def parse_payload(col: Column | str, schema: str) -> Column:
    """Typed JSON parse: ``from_json`` with a DDL schema string, e.g.
    ``parse_payload('props', 'k long')``. Unparseable rows yield null
    (the permissive mode the reference's dict conversion implies)."""
    return F.from_json(_c(col), schema)


def payload_map(col: Column | str) -> Column:
    """Schemaless JSON object as ``map<string,string>`` — the engine's
    ``json → dict`` (scalar values arrive as their literal strings)."""
    return F.from_json(_c(col), "map<string,string>")


def extract_path(col: Column | str, path: str) -> Column:
    """Ad-hoc JSONPath extraction (``get_json_object``), e.g.
    ``extract_path('props', '$.k')`` — returns a string or null."""
    return F.get_json_object(_c(col), path)


def render_payload(**fields: Column | str) -> Column:
    """Serialize named columns to a JSON object string (``to_json`` over
    a struct) — the write path for payload columns."""
    return F.to_json(
        F.struct(*[_c(c).alias(name) for name, c in fields.items()])
    )


def wrap_envelope(data: Column | str, **meta: Column | str) -> Column:
    """Proxy-envelope encode: ``{"data": <payload-as-string>, ...meta}``.
    The payload is embedded as an escaped JSON STRING (not a nested
    object) — the reference transports CSV/JSON text opaquely inside
    ``data`` (utils.py:548-559)."""
    return render_payload(data=_c(data), **meta)


def unwrap_envelope(
    col: Column | str, schema: str = "data string, status string"
) -> Column:
    """Proxy-envelope decode: returns the envelope struct; ``.data`` is
    the original payload text, unescaped (reference: v2.py:444-452
    ``response.json()["data"]``)."""
    return F.from_json(_c(col), schema)
