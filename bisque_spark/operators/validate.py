"""Batch validation: Pydantic-style field validation as Arrow operators.

North-star requirement (BASELINE.json): "bisque's Pydantic
field-extraction/validation schemas are re-expressed as pandas UDF
batch validators". The reference validates *node shape* via Pydantic
models on every tree node (/root/reference/src/bisque/models.py:17-41,
element/tag_core/tag.py:32-59); here the same per-row guarantees are
checked for whole Arrow batches at once — vectorized where the check is
columnar, per-row only where structure demands it — returning a
``valid boolean`` + ``errors array<string>`` pair instead of raising
(row-level error containment, SURVEY.md §4.2).

A validation *spec* is data (field → rules), so the same machinery
validates any table; ``IMAGES_SPEC`` pins the canonical sink schema
from BASELINE.json input_hint.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame

INT32_MAX = 2**31 - 1
INT64_MAX = 2**63 - 1


@dataclass(frozen=True)
class FieldRule:
    """Validation rules for one column (Pydantic field analogue)."""

    required: bool = True
    typ: type | tuple[type, ...] | None = None
    min_value: float | None = None
    max_value: float | None = None
    min_len: int | None = None
    allowed: frozenset | None = None
    # cross-field check: fn(row: dict) -> str | None (error message)
    row_check_name: str | None = None


IMAGES_SPEC: dict[str, FieldRule] = {
    "image_id": FieldRule(typ=str, min_len=1),
    "bytes": FieldRule(typ=(bytes, bytearray), min_len=1),
    "w": FieldRule(typ=int, min_value=1, max_value=INT32_MAX),
    "h": FieldRule(typ=int, min_value=1, max_value=INT32_MAX),
    "fmt": FieldRule(
        typ=str,
        allowed=frozenset(
            {"raw", "png", "jpeg", "gif", "tiff", "ico", "webp"}
        ),
    ),
    "caption": FieldRule(typ=str, min_len=0),
    "phash": FieldRule(typ=int, min_value=-INT64_MAX - 1, max_value=INT64_MAX),
}


def _row_checks_images(row: dict) -> list[str]:
    """Cross-field invariants for the images table: raw byte length must
    equal w·h·3 (the decoded-pixels invariant is checked separately by
    the PSNR gate; this is the cheap structural part)."""
    errs = []
    if (
        row.get("fmt") == "raw"
        and row.get("bytes") is not None
        and isinstance(row.get("w"), int)
        and isinstance(row.get("h"), int)
    ):
        want = row["w"] * row["h"] * 3
        if len(row["bytes"]) != want:
            errs.append(f"bytes: raw length {len(row['bytes'])} != w*h*3 {want}")
    return errs


_ROW_CHECKS = {"images": _row_checks_images}


def validate_rows(
    rows: pd.DataFrame, spec: dict[str, FieldRule], row_check: str | None = None
) -> tuple[list[bool], list[list[str]]]:
    """Pure function: batch → (valid flags, error lists). All field
    errors are collected per row (Pydantic ValidationError semantics:
    every failing field reported, not fail-fast)."""
    n = len(rows)
    all_errors: list[list[str]] = [[] for _ in range(n)]
    cols = set(rows.columns)
    for name, rule in spec.items():
        if name not in cols:
            if rule.required:
                for e in all_errors:
                    e.append(f"{name}: field missing")
            continue
        values = rows[name]
        for i, v in enumerate(values):
            if v is None or (isinstance(v, float) and pd.isna(v)):
                if rule.required:
                    all_errors[i].append(f"{name}: null")
                continue
            if rule.typ is not None and not isinstance(v, rule.typ):
                # numpy scalar tolerance: compare by python conversion
                try:
                    coerced = v.item() if hasattr(v, "item") else v
                except Exception:  # noqa: BLE001
                    coerced = v
                wants_int = rule.typ is int or (
                    isinstance(rule.typ, tuple) and int in rule.typ
                )
                if (
                    wants_int
                    and isinstance(coerced, float)
                    and coerced.is_integer()
                ):
                    # pandas upcasts nullable int batches to float64;
                    # integer-valued floats coerce (Pydantic lax mode)
                    coerced = int(coerced)
                if not isinstance(coerced, rule.typ):
                    all_errors[i].append(
                        f"{name}: expected {getattr(rule.typ, '__name__', rule.typ)}, "
                        f"got {type(v).__name__}"
                    )
                    continue
                v = coerced
            if rule.min_value is not None and v < rule.min_value:
                all_errors[i].append(f"{name}: {v} < min {rule.min_value}")
            if rule.max_value is not None and v > rule.max_value:
                all_errors[i].append(f"{name}: {v} > max {rule.max_value}")
            if rule.min_len is not None and hasattr(v, "__len__") and len(v) < rule.min_len:
                all_errors[i].append(f"{name}: length {len(v)} < {rule.min_len}")
            if rule.allowed is not None and v not in rule.allowed:
                all_errors[i].append(f"{name}: {v!r} not in {sorted(rule.allowed)}")
    if row_check and row_check in _ROW_CHECKS:
        fn = _ROW_CHECKS[row_check]
        records = rows.to_dict("records")
        for i, rec in enumerate(records):
            all_errors[i].extend(fn(rec))
    return [not e for e in all_errors], all_errors


def make_validate_batches(spec: dict[str, FieldRule], row_check: str | None = None):
    def validate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            valid, errors = validate_rows(pdf, spec, row_check)
            out = pdf.copy()
            out["valid"] = valid
            out["errors"] = errors
            yield out

    return validate


def validate_images(images: DataFrame) -> DataFrame:
    """images table → + (valid boolean, errors array<string>)."""
    schema = images.schema.simpleString()[7:-1]  # struct<...> → ...
    out_schema = (
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long, valid boolean, errors array<string>"
    )
    return images.select(
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash"
    ).mapInPandas(make_validate_batches(IMAGES_SPEC, "images"), schema=out_schema)
