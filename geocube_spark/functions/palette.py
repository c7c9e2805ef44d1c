"""Palette interpolation (C10).

Reference: internal/geocube/palette.go (96 LoC), proto
api/v1/pb/variables.proto:180-196 — ≥2 color points with values in [0,1],
piecewise-linear RGBA ramp sampled into a 256-entry LUT.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class ColorPoint:
    value: float  # in [0,1]
    r: int
    g: int
    b: int
    a: int


def validate_palette(points: list[ColorPoint]) -> None:
    """palette.go invariants: ≥2 points, first at 0, last at 1, sorted,
    channels in [0,255]."""
    if len(points) < 2:
        raise ValueError("palette needs at least 2 color points")
    if points[0].value != 0.0 or points[-1].value != 1.0:
        raise ValueError("palette must start at value 0 and end at value 1")
    for p0, p1 in zip(points[:-1], points[1:]):
        if p1.value <= p0.value:
            raise ValueError("palette points must be strictly increasing")
    for p in points:
        for ch in (p.r, p.g, p.b, p.a):
            if not 0 <= ch <= 255:
                raise ValueError("palette channels must be in [0,255]")


def build_lut(points: list[ColorPoint], size: int = 256) -> list[tuple[int, int, int, int]]:
    """Sample the piecewise-linear ramp into a ``size``-entry RGBA LUT —
    the Palette.PaletteN of the reference."""
    validate_palette(points)
    lut = []
    seg = 0
    for i in range(size):
        v = i / (size - 1)
        while seg < len(points) - 2 and v > points[seg + 1].value:
            seg += 1
        p0, p1 = points[seg], points[seg + 1]
        t = 0.0 if p1.value == p0.value else (v - p0.value) / (p1.value - p0.value)
        t = min(max(t, 0.0), 1.0)
        lut.append(
            (
                round(p0.r + (p1.r - p0.r) * t),
                round(p0.g + (p1.g - p0.g) * t),
                round(p0.b + (p1.b - p0.b) * t),
                round(p0.a + (p1.a - p0.a) * t),
            )
        )
    return lut


def apply_palette_expr(px, lut: list[tuple[int, int, int, int]]):
    """Column expression mapping normalized [0,1] pixels -> packed RGBA int
    via the LUT (array literal indexing — JVM-side)."""
    from pyspark.sql import functions as F

    packed = [((r << 24) | (g << 16) | (b << 8) | a) for r, g, b, a in lut]
    lut_col = F.array(*[F.lit(v) for v in packed])
    n = len(lut) - 1
    return F.transform(
        px,
        lambda v: F.element_at(
            lut_col,
            (
                F.least(F.greatest(F.round(v * n, 0), F.lit(0)), F.lit(float(n))).cast("int")
                + 1
            ),
        ),
    )
