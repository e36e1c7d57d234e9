"""Bucketed shape padding: survive BO-loop data growth with O(log N) compiles.

Every BO iteration appends one row to the training set; under jit that means
new array shapes and a full recompile of the training scans, the conditioned
trainer, the Pareto-sampling programs and the acquisition programs — with 1-5
minute compiles over a TPU tunnel, recompilation dominates a 60-iteration
campaign.

Fix: round the row count N up to a geometric bucket and pad with

- inputs placed FAR outside the unit box (x_pad[i] = 100 + 10*i on every
  coordinate: the deep-MF kernel's smooth component uses a 10x-median
  lengthscale, so pads must be very far out for k(x, pad) to vanish, and
  10-apart from each other so the padded Gram blocks are near-diagonal and
  Cholesky stays well conditioned — same trick as linalg/fused_svgp.py uses
  for its tile padding);
- fidelity -1 (matches no layer: padded rows contribute exactly zero to every
  per-fidelity data term and never enter per-fidelity statistics or the
  nearest-neighbor inducing init, models/mfdgp.py:137-156);
- target 0 and row weight 0 (masked out of batch counts and KL scaling).

Because the MFDGP uses ALL training inputs as inducing points (reference
mobocmf/models/mfdgp.py:290-317), padding rows necessarily pads the inducing
set too. That is mathematically sound — an SVGP posterior is valid for any
inducing set, the extra far-away points just add (unused) capacity — but it
is a deliberate deviation from the reference's exact Z = x_train, so it is
switchable: ON by default in the TPU-first BO loop (BOConfig.pad_data=True),
OFF by default at the fitter level (BlackBoxMFDGPFitter(pad_data=False));
the f64 parity paths keep exact shapes.

Buckets: multiples of 16 up to 64, then the step doubles with each octave
(32 for 65..128, 64 for 129..256, ...), so a campaign growing N from 15 to 75
compiles the training programs ~5 times instead of 60. Padded rows cost real
step time (the inducing Cholesky is O(bucket^3): measured ~+0.8 s of training
per +8 padded rows per full-settings iteration) but a bucket-boundary
recompile costs ~100 s, so coarse buckets win decisively at campaign scale.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

PAD_FIDELITY = -1


def next_bucket(n: int) -> int:
    """Smallest bucket >= n (multiples of 16, step doubling per octave)."""
    if n <= 8:
        return 8
    step, cap = 16, 64
    while n > cap:
        step *= 2
        cap *= 2
    return ((n + step - 1) // step) * step


def pad_inputs_np(
    x: np.ndarray, fidelities: np.ndarray, target: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pad (x, fidelities) with far-away rows up to `target` rows, on HOST
    (aggregate python+dispatch overhead on the 1-core host, ~0.1 ms/dispatch
    measured in benchmarks/probe_setup.py; setup padding is
    pure numpy and device arrays are created once per fitter).

    Pads are 100 + 10*i on every coordinate: the deep-MF kernel's smooth
    component uses a 10x-median lengthscale (~5 on unit-box data), so pads
    must be VERY far out for k(x, pad) to vanish; 10-apart keeps pad-pad
    correlations small enough for a well-conditioned Gram.

    Returns (x_padded, fidelities_padded, row_weights) where row_weights is
    1.0 for real rows and 0.0 for padding."""
    n, d = x.shape
    extra = target - n
    assert extra >= 0, f"target {target} < rows {n}"
    if extra == 0:
        return x, fidelities, np.ones((n,), dtype=x.dtype)
    pad_x = 100.0 + 10.0 * np.arange(extra, dtype=x.dtype)[:, None] * np.ones(
        (1, d), dtype=x.dtype
    )
    x_p = np.concatenate([x, pad_x], axis=0)
    fid_p = np.concatenate(
        [
            np.asarray(fidelities).reshape(-1).astype(np.int32),
            np.full((extra,), PAD_FIDELITY, dtype=np.int32),
        ]
    )
    w = np.concatenate([np.ones((n,), dtype=x.dtype), np.zeros((extra,), dtype=x.dtype)])
    return x_p, fid_p, w


def pad_rows_np(a: np.ndarray, target: int, fill: float = 0.0) -> np.ndarray:
    """Host-side helper: pad the leading axis of a numpy array."""
    extra = target - a.shape[0]
    if extra <= 0:
        return a
    pad_shape = (extra,) + a.shape[1:]
    return np.concatenate([a, np.full(pad_shape, fill, dtype=a.dtype)], axis=0)
