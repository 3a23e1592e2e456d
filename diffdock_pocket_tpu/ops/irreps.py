"""Minimal O(3) irreps bookkeeping (static metadata, hashable).

Replaces the e3nn ``o3.Irreps`` surface the reference models rely on
(reference: models/score_model.py:154, 195-208 irrep ladders).  Only what the
DiffDock-Pocket architecture needs: parsing, dims, slices, ladder helpers.
All of this is *static* Python executed at trace time — nothing here touches
arrays.
"""
from __future__ import annotations

import re
from dataclasses import dataclass
from functools import cached_property


@dataclass(frozen=True, order=True)
class Irrep:
    l: int
    p: int  # +1 even, -1 odd

    @property
    def dim(self) -> int:
        return 2 * self.l + 1

    def __str__(self) -> str:
        return f"{self.l}{'e' if self.p == 1 else 'o'}"

    @staticmethod
    def parse(s: str) -> "Irrep":
        m = re.fullmatch(r"(\d+)([eo])", s.strip())
        if not m:
            raise ValueError(f"bad irrep {s!r}")
        return Irrep(int(m.group(1)), 1 if m.group(2) == "e" else -1)


@dataclass(frozen=True)
class Irreps:
    """An ordered list of (multiplicity, Irrep) blocks."""

    blocks: tuple[tuple[int, Irrep], ...]

    @staticmethod
    def parse(s: "str | Irreps") -> "Irreps":
        if isinstance(s, Irreps):
            return s
        blocks = []
        for part in s.split("+"):
            part = part.strip()
            if not part:
                continue
            if "x" in part:
                mul, ir = part.split("x")
                blocks.append((int(mul), Irrep.parse(ir)))
            else:
                blocks.append((1, Irrep.parse(part)))
        return Irreps(tuple(blocks))

    @property
    def dim(self) -> int:
        return sum(mul * ir.dim for mul, ir in self.blocks)

    @property
    def num_blocks(self) -> int:
        return len(self.blocks)

    def slices(self) -> list[slice]:
        out, start = [], 0
        for mul, ir in self.blocks:
            out.append(slice(start, start + mul * ir.dim))
            start += mul * ir.dim
        return out

    def mul_of(self, ir: Irrep) -> int:
        return sum(mul for mul, i in self.blocks if i == ir)

    def __iter__(self):
        return iter(self.blocks)

    def __str__(self) -> str:
        return " + ".join(f"{mul}x{ir}" for mul, ir in self.blocks)

    def sorted_simplified(self) -> "Irreps":
        """Merge equal irreps and sort by (l, p) — used for unweighted
        tensor-product outputs, mirroring e3nn's sort().simplify()."""
        acc: dict[Irrep, int] = {}
        for mul, ir in self.blocks:
            acc[ir] = acc.get(ir, 0) + mul
        items = sorted(acc.items(), key=lambda kv: (kv[0].l, -kv[0].p))
        return Irreps(tuple((mul, ir) for ir, mul in items))


def sh_irreps(lmax: int) -> Irreps:
    """Spherical-harmonics irreps ladder 0e + 1o + 2e + ... up to lmax."""
    return Irreps(tuple((1, Irrep(l, (-1) ** l)) for l in range(lmax + 1)))


def feature_ladder(ns: int, nv: int, use_second_order: bool) -> list[Irreps]:
    """The DiffDock feature-irreps growth ladder across conv layers
    (reference: models/score_model.py:195-208)."""
    if use_second_order:
        seq = [
            f"{ns}x0e",
            f"{ns}x0e + {nv}x1o + {nv}x2e",
            f"{ns}x0e + {nv}x1o + {nv}x2e + {nv}x1e + {nv}x2o",
            f"{ns}x0e + {nv}x1o + {nv}x2e + {nv}x1e + {nv}x2o + {ns}x0o",
        ]
    else:
        seq = [
            f"{ns}x0e",
            f"{ns}x0e + {nv}x1o",
            f"{ns}x0e + {nv}x1o + {nv}x1e",
            f"{ns}x0e + {nv}x1o + {nv}x1e + {ns}x0o",
        ]
    return [Irreps.parse(s) for s in seq]
