"""Affine geotransform algebra (C7).

Reference: internal/utils/affine/affine.go (78 LoC) — the 6-coefficient
pixel->CRS transform [a b c; d e f] with translate/scale/multiply/inverse.
Pure-python value class; broadcast to executors as a plain tuple.
Layout matches GDAL order: x' = c + a*col + b*row ; y' = f + d*col + e*row.
"""

from __future__ import annotations

from dataclasses import dataclass


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
            self.c + self.a * col + self.b * row,
            self.f + self.d * col + self.e * row,
        )

    def multiply(self, o: "Affine") -> "Affine":
        """self ∘ o: apply o first, then self (matrix product)."""
        return Affine(
            self.a * o.a + self.b * o.d,
            self.a * o.b + self.b * o.e,
            self.a * o.c + self.b * o.f + self.c,
            self.d * o.a + self.e * o.d,
            self.d * o.b + self.e * o.e,
            self.d * o.c + self.e * o.f + self.f,
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
