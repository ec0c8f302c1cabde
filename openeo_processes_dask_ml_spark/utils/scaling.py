"""MLM value-scaling transforms as Catalyst Column expressions.

The reference applies these numpy-side per chunk (reference:
openeo_processes_dask_ml/process_implementations/utils/scaling_utils.py:61-98).
Here each kind is a pure Column expression, so scaling fuses into
whole-stage codegen with the rest of the projection — no Python boundary.

Kinds (value = input column):
  min-max   (v - min) / (max - min)
  z-score   (v - mean) / stddev
  clip      clamp to [min, max]
  clip-min  clamp below
  clip-max  clamp above
  offset    v - value
  scale     v / value
  processing  -> NotImplementedError (matches reference :92-96)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALING_REQUIRED_PROPS: dict[str, tuple[str, ...]] = {
    "min-max": ("minimum", "maximum"),
    "z-score": ("mean", "stddev"),
    "clip": ("minimum", "maximum"),
    "clip-min": ("minimum",),
    "clip-max": ("maximum",),
    "offset": ("value",),
    "scale": ("value",),
    "processing": ("format", "expression"),
}


@dataclass(frozen=True)
class ValueScaling:
    """One MLM ``value_scaling`` entry (STAC-MLM spec)."""

    kind: str
    minimum: float | None = None
    maximum: float | None = None
    mean: float | None = None
    stddev: float | None = None
    value: float | None = None

    def validate(self) -> None:
        required = SCALING_REQUIRED_PROPS.get(self.kind)
        if required is None:
            raise ValueError(f"unknown scaling type: {self.kind!r}")
        missing = [p for p in required if getattr(self, p, None) is None]
        if missing:
            raise ValueError(f"scaling {self.kind!r} missing properties: {missing}")

    def expr(self, col: Column) -> Column:
        self.validate()
        k = self.kind
        if k == "min-max":
            return (col - F.lit(self.minimum)) / F.lit(self.maximum - self.minimum)
        if k == "z-score":
            return (col - F.lit(self.mean)) / F.lit(self.stddev)
        if k == "clip":
            return F.least(F.greatest(col, F.lit(self.minimum)), F.lit(self.maximum))
        if k == "clip-min":
            return F.greatest(col, F.lit(self.minimum))
        if k == "clip-max":
            return F.least(col, F.lit(self.maximum))
        if k == "offset":
            return col - F.lit(self.value)
        if k == "scale":
            return col / F.lit(self.value)
        raise NotImplementedError(f"scaling type {k!r} is not supported")

    @classmethod
    def from_dict(cls, d: dict) -> "ValueScaling":
        return cls(
            kind=d.get("type") or d.get("kind"),
            minimum=d.get("minimum"),
            maximum=d.get("maximum"),
            mean=d.get("mean"),
            stddev=d.get("stddev"),
            value=d.get("value"),
        )


def apply_scaling(col: Column, scalings: list[ValueScaling]) -> Column:
    """Compose a chain of scaling steps into one expression."""
    out = col
    for s in scalings:
        out = s.expr(out)
    return out
