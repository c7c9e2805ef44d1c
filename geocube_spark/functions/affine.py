"""Affine geotransform algebra (C7).

Reference: internal/utils/affine/affine.go (78 LoC) — the 6-coefficient
pixel->CRS transform [a b c; d e f] with translate/scale/multiply/inverse.
Pure-python value class; broadcast to executors as a plain tuple.
Layout matches GDAL order: x' = c + a*col + b*row ; y' = f + d*col + e*row.
"""

from __future__ import annotations

from dataclasses import dataclass
from fractions import Fraction


def _hp(o: float, sx: float, x: float, sy: float, y: float) -> float:
    """``o + sx*x + sy*y`` CORRECTLY ROUNDED (one rounding, not three) —
    the reference computes this in extended precision
    (affine.go:52-61 highPrecisionTransform) so that composing a
    geotransform with a large pixel Translation stays bit-compatible
    with direct application at deep-zoom offsets.  Exact-rational
    evaluation + one float conversion gives the identical contract.
    Driver-/group-level call sites only (never per-pixel)."""
    return float(
        Fraction(o) + Fraction(sx) * Fraction(x) + Fraction(sy) * Fraction(y)
    )


@dataclass(frozen=True)
class Affine:
    a: float  # x pixel width
    b: float  # x row skew
    c: float  # x origin
    d: float  # y column skew
    e: float  # y pixel height (negative for north-up)
    f: float  # y origin

    @staticmethod
    def translation(tx: float, ty: float) -> "Affine":
        return Affine(1.0, 0.0, tx, 0.0, 1.0, ty)

    @staticmethod
    def scale(sx: float, sy: float) -> "Affine":
        return Affine(sx, 0.0, 0.0, 0.0, sy, 0.0)

    @staticmethod
    def identity() -> "Affine":
        return Affine(1.0, 0.0, 0.0, 0.0, 1.0, 0.0)

    def apply(self, col: float, row: float) -> tuple[float, float]:
        return (
            _hp(self.c, self.a, col, self.b, row),
            _hp(self.f, self.d, col, self.e, row),
        )

    def multiply(self, o: "Affine") -> "Affine":
        """self ∘ o: apply o first, then self (matrix product; every
        coefficient correctly rounded like the reference's
        high-precision Multiply)."""
        return Affine(
            _hp(0.0, self.a, o.a, self.b, o.d),
            _hp(0.0, self.a, o.b, self.b, o.e),
            _hp(self.c, self.a, o.c, self.b, o.f),
            _hp(0.0, self.d, o.a, self.e, o.d),
            _hp(0.0, self.d, o.b, self.e, o.e),
            _hp(self.f, self.d, o.c, self.e, o.f),
        )

    def determinant(self) -> float:
        return self.a * self.e - self.b * self.d

    def invertible(self, eps: float = 1e-15) -> bool:
        return abs(self.determinant()) > eps

    def inverse(self) -> "Affine":
        det = self.determinant()
        if abs(det) < 1e-15:
            raise ValueError("affine transform is not invertible")
        ia = self.e / det
        ib = -self.b / det
        id_ = -self.d / det
        ie = self.a / det
        ic = -(ia * self.c + ib * self.f)
        if_ = -(id_ * self.c + ie * self.f)
        return Affine(ia, ib, ic, id_, ie, if_)

    def to_struct(self) -> dict[str, float]:
        return {"a": self.a, "b": self.b, "c": self.c, "d": self.d, "e": self.e, "f": self.f}

    @staticmethod
    def from_struct(s) -> "Affine":
        return Affine(s["a"], s["b"], s["c"], s["d"], s["e"], s["f"])
