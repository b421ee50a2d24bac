"""XZ-order SFC for spatial extents (vectorized numpy).

From-scratch implementation of the XZ-ordering scheme used by the
reference for non-point geometries (core/index/.../sfc/xz/XZOrderSFC.java,
500 LoC; hierarchical strategy XZHierarchicalIndexStrategy.java:46-107),
after Böhm/Klump/Kriegel "XZ-Ordering: A Space-Filling Curve for Objects
with Spatial Extension" (SSD'99 — public literature).

An envelope maps to ONE code (no duplication): the longest quadtree
prefix whose *enlarged* element (the cell doubled in width and height)
still contains the envelope.  Codes of a subtree form a contiguous range,
so bbox queries decompose into code ranges exactly like the tiered
Hilbert index — and a DataFrame indexed by ``xz`` prunes with simple
``BETWEEN`` predicates.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 16  # 4^16 fits comfortably in int64 via the psi sum


def _subtree_size(level_remaining: int) -> int:
    """Number of codes in a subtree rooted at an element with
    ``level_remaining`` levels below it: 1 + 4 + … + 4^lr = (4^(lr+1)-1)/3."""
    return ((4 ** (level_remaining + 1)) - 1) // 3


def xz_encode(
    minx: np.ndarray,
    miny: np.ndarray,
    maxx: np.ndarray,
    maxy: np.ndarray,
    max_level: int = MAX_LEVEL,
) -> np.ndarray:
    """Envelopes (normalized to [0,1]²) → XZ sequence codes (int64).

    Level selection: l = largest level whose enlarged element (side
    2·2^-l) can contain the envelope AND whose element anchored at the
    envelope's min corner actually does — XZOrderSFC.java's
    getSequenceCode semantics."""
    minx = np.clip(np.asarray(minx, dtype=np.float64), 0.0, 1.0)
    miny = np.clip(np.asarray(miny, dtype=np.float64), 0.0, 1.0)
    maxx = np.clip(np.asarray(maxx, dtype=np.float64), 0.0, 1.0)
    maxy = np.clip(np.asarray(maxy, dtype=np.float64), 0.0, 1.0)
    w = np.maximum(maxx - minx, 1e-300)
    h = np.maximum(maxy - miny, 1e-300)
    # candidate level: enlarged element side 2^-(l-1) ≥ max(w,h)
    l = np.minimum(
        np.floor(-np.log2(np.maximum(w, h))).astype(np.int64) + 1, max_level
    )
    l = np.maximum(l, 0)
    # verify containment of the anchored enlarged element; step down once
    # if the envelope straddles a coarser boundary
    for _ in range(2):
        size = np.ldexp(1.0, -l)  # 2^-l element side
        ax = np.floor(minx / size) * size
        ay = np.floor(miny / size) * size
        ok = (maxx <= ax + 2 * size) & (maxy <= ay + 2 * size)
        l = np.where(ok, l, l - 1)
        l = np.maximum(l, 0)
    # quadrant digit walk: z-order digits of the anchor cell at level l
    codes = np.zeros(len(l), dtype=np.int64)
    x0 = np.zeros(len(l))
    y0 = np.zeros(len(l))
    size = np.ones(len(l))
    for i in range(1, max_level + 1):
        active = l >= i
        if not active.any():
            break
        size_h = size / 2.0
        dx = (minx >= x0 + size_h).astype(np.int64)
        dy = (miny >= y0 + size_h).astype(np.int64)
        digit = dx * 2 + dy
        step = _subtree_size(max_level - i)
        codes = np.where(active, codes + 1 + digit * step, codes)
        x0 = np.where(active, x0 + dx * size_h, x0)
        y0 = np.where(active, y0 + dy * size_h, y0)
        size = np.where(active, size_h, size)
    return codes


def xz_query_ranges(
    qminx: float,
    qminy: float,
    qmaxx: float,
    qmaxy: float,
    max_level: int = MAX_LEVEL,
    max_ranges: int = 512,
) -> list[tuple[int, int]]:
    """Inclusive XZ code ranges covering every element whose ENLARGED cell
    intersects the query box — the coarse pruning predicate for an
    xz-indexed table (XZOrderSFC.toRanges semantics, cost-capped like the
    reference's bounded decomposition)."""
    out: list[tuple[int, int]] = []
    # stack entries: (code_of_element, x0, y0, size, level)
    stack = [(0, 0.0, 0.0, 1.0, 0)]
    while stack:
        code, x0, y0, size, level = stack.pop()
        # enlarged element of THIS node intersects query? (node itself
        # represents objects anchored here with extent ≤ 2*size)
        if qminx > x0 + 2 * size or qmaxx < x0 or qminy > y0 + 2 * size or qmaxy < y0:
            continue
        contained = (
            x0 >= qminx - size and x0 + 2 * size <= qmaxx + size
            and y0 >= qminy - size and y0 + 2 * size <= qmaxy + size
        )
        remaining = max_level - level
        if level >= max_level or contained or len(out) + len(stack) >= max_ranges:
            # take the whole subtree: codes are contiguous
            out.append((code, code + _subtree_size(remaining) - 1))
            continue
        out.append((code, code))  # the element itself
        half = size / 2.0
        step = _subtree_size(max_level - level - 1)
        for digit, (dx, dy) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            stack.append(
                (
                    code + 1 + digit * step,
                    x0 + dx * half,
                    y0 + dy * half,
                    half,
                    level + 1,
                )
            )
    out.sort()
    # merge adjacent/overlapping
    merged: list[tuple[int, int]] = []
    for lo, hi in out:
        if merged and lo <= merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
        else:
            merged.append((lo, hi))
    return merged
