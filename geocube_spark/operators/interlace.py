"""MuCOG interlacing-pattern grammar (layouts.proto:41-66, mucog.go:30-97).

A pattern is one or more ``;``-chained CLAUSES.  Each clause prioritizes
the four levels — [R]ecords, [B]ands, [Z]ooms, [T]iles — as
``L1>L2>L3>L4``: all L4 for a given (L1, L2, L3) are contiguous.  Every
level except T may carry a SELECTOR restricting which indices the clause
covers:

- by values: ``B=0,2,3``
- by range (end-exclusive, either end omittable): ``Z=1:``, ``B=0:3``,
  ``R=:2``

``Z=0`` is full resolution, ``Z=1`` the 2× overview, and so on.  R and B
selectors index the SORTED DISTINCT record/band sets (records
chronologically, bands by stored id) — the reference's "value 0, 2 and 3
of the level".  A block is written by the FIRST clause that selects it;
blocks no clause selects are appended last in Z>T>R>B order (the
reference requires full coverage — the fallback keeps the writer total
rather than silently dropping payloads).

The same parsed grammar drives BOTH sinks:
- :func:`interlace_order` — the byte-level write order of
  ``sources/gtiff.write_tiff`` (MuCOG tile data region);
- ``consolidation.interlacing_sort_columns`` — the
  ``sortWithinPartitions`` column list of the consolidated-parquet twin.
"""

from __future__ import annotations

from dataclasses import dataclass

LEVELS = ("R", "B", "Z", "T")


class InterlacingError(ValueError):
    pass


@dataclass(frozen=True)
class Selector:
    """``None`` fields in a range mean open-ended; ``values`` wins when
    set."""

    values: tuple[int, ...] | None = None
    lo: int | None = None
    hi: int | None = None  # exclusive

    def accepts(self, idx: int) -> bool:
        if self.values is not None:
            return idx in self.values
        if self.lo is not None and idx < self.lo:
            return False
        if self.hi is not None and idx >= self.hi:
            return False
        return True


_ALL = Selector()


@dataclass(frozen=True)
class Clause:
    order: tuple[str, ...]  # permutation of LEVELS, outermost first
    selectors: dict[str, Selector]

    def accepts(self, key: dict[str, int]) -> bool:
        return all(self.selectors[lvl].accepts(key[lvl]) for lvl in LEVELS)

    def sort_key(self, key: dict[str, int]) -> tuple[int, ...]:
        return tuple(key[lvl] for lvl in self.order)


def _parse_selector(text: str) -> Selector:
    text = text.strip()
    if ":" in text:
        lo_s, hi_s = text.split(":", 1)
        lo = int(lo_s) if lo_s.strip() else None
        hi = int(hi_s) if hi_s.strip() else None
        if lo is not None and hi is not None and hi <= lo:
            raise InterlacingError(f"empty range selector: {text!r}")
        return Selector(lo=lo, hi=hi)
    vals = tuple(int(v) for v in text.split(",") if v.strip())
    if not vals:
        raise InterlacingError(f"empty value selector: {text!r}")
    return Selector(values=vals)


def parse_interlacing(pattern: str) -> list[Clause]:
    """Parse a full pattern into clauses; raises InterlacingError on a
    malformed level list, duplicate/missing levels, or a T selector."""
    clauses: list[Clause] = []
    for raw in pattern.split(";"):
        raw = raw.strip()
        if not raw:
            continue
        order: list[str] = []
        selectors: dict[str, Selector] = {}
        for token in raw.split(">"):
            token = token.strip()
            if "=" in token:
                lvl, sel_text = token.split("=", 1)
                lvl = lvl.strip().upper()
                sel = _parse_selector(sel_text)
            else:
                lvl, sel = token.upper(), _ALL
            if lvl not in LEVELS:
                raise InterlacingError(f"unknown interlacing level {lvl!r}")
            if lvl in order:
                raise InterlacingError(f"duplicate level {lvl} in {raw!r}")
            if lvl == "T" and sel is not _ALL:
                raise InterlacingError(
                    "T (tile) level cannot carry a selector (layouts.proto)"
                )
            order.append(lvl)
            selectors[lvl] = sel
        if sorted(order) != sorted(LEVELS):
            raise InterlacingError(
                f"clause {raw!r} must name all four levels R,B,Z,T exactly "
                f"once (got {order})"
            )
        clauses.append(Clause(tuple(order), selectors))
    if not clauses:
        raise InterlacingError(f"empty interlacing pattern: {pattern!r}")
    return clauses


_FALLBACK = Clause(("Z", "T", "R", "B"), {lvl: _ALL for lvl in LEVELS})


def interlace_order(
    items: list[dict[str, int]], pattern: str | list[Clause]
) -> list[int]:
    """Write order of ``items`` (each a {'R','B','Z','T'} index dict) under
    the pattern: concatenation of each clause's nested-loop ordering over
    the blocks it is FIRST to select, then the fallback Z>T>R>B tail for
    unselected blocks."""
    clauses = (
        parse_interlacing(pattern) if isinstance(pattern, str) else pattern
    )
    remaining = list(range(len(items)))
    out: list[int] = []
    for clause in [*clauses, _FALLBACK]:
        taken = [i for i in remaining if clause.accepts(items[i])]
        taken.sort(key=lambda i: clause.sort_key(items[i]))
        out.extend(taken)
        remaining = [i for i in remaining if not clause.accepts(items[i])]
        if not remaining:
            break
    return out
