"""Real Fourier azimuthal rings, TPU-first.

The reference (via its un-vendored Springsteel dependency) represents the
azimuthal direction of RL/RLZ polar grids with real Fourier harmonics whose
per-ring resolution grows with radius [inferred; SURVEY.md 2.4].  A ragged
per-ring layout is hostile to XLA's static shapes, so the TPU-native design
uses a *uniform* number of azimuthal points ``nl`` for every ring together
with a per-ring spectral mask: ring i keeps only wavenumbers
``k <= kmax_i ~ pi * r_i / dr`` so the resolved azimuthal arc length matches
the radial resolution everywhere and the polar axis stays regular.  This
keeps every transform a dense batched rFFT/matmul while reproducing the
reference's variable-resolution semantics.

Azimuthal derivative slots are with respect to the angle lambda itself
(physical operators divide by r at point of use, matching the reference
equation sets, e.g. src/shallowWaterModels.jl:291-293).
"""

from __future__ import annotations

import numpy as np


def ring_kmax(r: np.ndarray, dr: float, nl: int, l_q: float = 2.0) -> np.ndarray:
    """Max resolved azimuthal wavenumber per ring.

    Criterion: finest resolved arc wavelength 2 pi r / k >= l_q * dr
    (the same cutoff scale as the radial spline filter), capped by the
    uniform grid Nyquist nl // 2.
    """
    lq = l_q if l_q > 0 else 2.0
    kmax = np.floor(2.0 * np.pi * np.asarray(r) / (lq * dr)).astype(int)
    return np.clip(kmax, 1, nl // 2)


def ring_mask(r: np.ndarray, dr: float, nl: int, l_q: float = 2.0) -> np.ndarray:
    """[nr, nl//2 + 1] float mask over rfft wavenumbers for each ring."""
    kmax = ring_kmax(r, dr, nl, l_q)
    k = np.arange(nl // 2 + 1)
    return (k[None, :] <= kmax[:, None]).astype(np.float64)


def default_nl(num_cells: int, requested: int = 0) -> int:
    """Uniform azimuthal point count.

    If the user requested an explicit ``lDim`` use the next even value;
    otherwise size so the *outermost* ring is dealiased at roughly the
    radial mish resolution, rounded up to a power of two for FFT/TPU
    friendliness (bounded to keep memory sane).
    """
    if requested:
        return int(requested + (requested % 2))
    target = 2 * np.pi * (3 * num_cells) / 2.0  # points ~ pi * rDim
    nl = 8
    while nl < target and nl < 2048:
        nl *= 2
    return nl


def angles(nl: int) -> np.ndarray:
    return 2.0 * np.pi * np.arange(nl) / nl
