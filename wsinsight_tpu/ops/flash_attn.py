"""Fused window attention for the SAM/ViT encoders (pallas, TPU).

The reference executes CellViT attention inside opaque TorchScript
(reference: modellib/run_inference.py:446-456 drives the forward); upstream
SAM materializes the (windows*B*heads, N, N) attention tensor in global
memory and adds decomposed rel-pos to it with two broadcast adds. On TPU
that layout churn — window partition/unpartition transposes, per-head
q/k/v transposes, and three HBM round-trips over the score tensor — costs
more than every matmul in the block combined (measured ~1.5-2.4 ms per
SAM-H windowed block at batch 8 vs ~0.5 ms of matmul work; docs/design.md
"CellViT-SAM-H roofline").

Kernel design (one grid step per (image, window, head) triple):

- XLA prepares the qkv grid once in a window-major, head-major layout
  padded to the 128-lane MXU tile: (B, nw, N, heads * 3 * hdp) with
  hdp = ceil(hd/128)*128. Every pallas block is then
  (1, 1, N, 3*hdp) — second-minor equal to the array dim, lanes a
  multiple of 128 — so Mosaic never relayouts inside the kernel.
- The whole attention core stays in VMEM; the (N, N) score tensor never
  touches HBM.
- Decomposed rel-pos runs as three ALIGNED MXU matmuls per axis instead
  of broadcast adds, using the identity
      rel_h[(qh,qw),(kh,kw)] = sum_c q[(qh,qw),c] * Rh[qh,kh,c]
                             = (((q @ W2h) * Mh) @ Eh)[(qh,qw),(kh,kw)]
  where W2h[c,(j,kh)] = Rh[j,kh,c] computes the full cross product
  G[(qh,qw),(j,kh)] = q . Rh[j,kh], the constant one-hot mask
  Mh[(qh,qw),(j,kh)] = [j==qh] selects the diagonal j=qh, and the
  constant expander Eh[(j,kh),(kh',kw)] = [kh==kh'] broadcasts over kw.
  The j != qh entries of G are wasted FLOPs (ah x over the minimal
  einsum) but they ride the MXU at full tile utilization, which beats
  the tiny-N batched einsums XLA emits for the decomposed form.
- Softmax runs in f32 in VMEM; only the (N, hdp) output block is written.

Numerics match the unfused formulation to f32 rounding (same contraction
dtype, same f32 softmax); with bf16 activations the rel values round to
bf16 before the score accumulate, the same rounding the shipped bf16
score-storage path applies (validated in tests/test_flash_attn.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # TPU memory spaces; interpret mode covers CPU tests.
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None


def _rel_consts(ah: int, aw: int, hdp: int, rh, rw, dtype):
    """Constants for the masked cross-product rel-pos formulation.

    rh: (ah, ah, hd) table with rh[qh, kh] = rel_pos_h[qh - kh + ah - 1];
    rw likewise over (aw, aw, hd). Token order is row-major (qh major).
    """
    hd = rh.shape[-1]
    n = ah * aw
    # W2[c, (j,k)] = R[j, k, c], channel-padded to hdp
    w2h = jnp.pad(jnp.asarray(rh), ((0, 0), (0, 0), (0, hdp - hd)))
    w2h = w2h.transpose(2, 0, 1).reshape(hdp, ah * ah)
    w2w = jnp.pad(jnp.asarray(rw), ((0, 0), (0, 0), (0, hdp - hd)))
    w2w = w2w.transpose(2, 0, 1).reshape(hdp, aw * aw)
    # Mh[(qh,qw), (j,kh)] = [j == qh]; Mw[(qh,qw), (j,kw)] = [j == qw]
    mh = np.kron(np.eye(ah, dtype=np.float32), np.ones((aw, ah), np.float32))
    mw = np.tile(np.repeat(np.eye(aw, dtype=np.float32), aw, axis=1), (ah, 1))
    # Eh[(j,kh), (kh',kw)] = [kh == kh']; Ew[(j,kw), (kh,kw')] = [kw == kw']
    eh = np.tile(np.repeat(np.eye(ah, dtype=np.float32), aw, axis=1), (ah, 1))
    ew = np.tile(np.tile(np.eye(aw, dtype=np.float32), (1, ah)), (aw, 1))
    assert mh.shape == (n, ah * ah) and eh.shape == (ah * ah, n)
    assert mw.shape == (n, aw * aw) and ew.shape == (aw * aw, n)
    return (
        w2h.astype(dtype),
        w2w.astype(dtype),
        jnp.asarray(mh, dtype),
        jnp.asarray(mw, dtype),
        jnp.asarray(eh, dtype),
        jnp.asarray(ew, dtype),
    )


def _make_kernel(n: int, hdp: int, scale: float, with_rel: bool, hpp: int):
    """hpp = heads per program: amortizes the per-grid-step control/DMA
    overhead (~1-2 us on the tunneled v5e) over several heads; lane slices
    at multiples of 3*hdp stay 128-aligned so Mosaic never relayouts."""
    f32 = jnp.float32

    def kernel(qkv_ref, *rest):
        o_ref = rest[-1]
        rel = tuple(r[...] for r in rest[:-1]) if with_rel else None
        for i in range(hpp):
            blk = qkv_ref[0, 0, :, i * 3 * hdp:(i + 1) * 3 * hdp]  # (n, 3*hdp)
            q = blk[:, 0:hdp]
            k = blk[:, hdp:2 * hdp]
            v = blk[:, 2 * hdp:3 * hdp]
            s = jax.lax.dot_general(
                q * jnp.asarray(scale, q.dtype), k,
                (((1,), (1,)), ((), ())), preferred_element_type=f32,
            )
            if with_rel:
                w2h, w2w, mh, mw, eh, ew = rel
                for w2, m, e in ((w2h, mh, eh), (w2w, mw, ew)):
                    g = jax.lax.dot_general(  # full cross product q . R[j,k]
                        q, w2, (((1,), (0,)), ((), ())),
                        preferred_element_type=f32,
                    ).astype(q.dtype)
                    s += jax.lax.dot_general(  # select j == q-row, expand
                        g * m, e, (((1,), (0,)), ((), ())),
                        preferred_element_type=f32,
                    )
            mx = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - mx)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            out = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            o_ref[0, 0, :, i * hdp:(i + 1) * hdp] = out.astype(o_ref.dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "window", "scale", "interpret"),
)
def window_attention(
    qkv: jax.Array,
    num_heads: int,
    window: int,
    scale: float,
    rh: jax.Array | None = None,
    rw: jax.Array | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused multi-head (windowed) attention over a qkv feature grid.

    qkv: (B, HP, WP, 3*dim) with channel layout [q | k | v], each split into
    ``num_heads`` heads of ``hd`` lanes (the torch nn.Linear qkv layout).
    HP/WP must be multiples of ``window`` (pass the padded grid; padding
    rows carry the qkv bias, which is exactly what zero-padding the input
    of the projection would have produced). ``window == 0`` means global
    attention over the full (HP, WP) grid.

    rh/rw: optional Toeplitz-expanded rel-pos tables (ah, ah, hd) /
    (aw, aw, hd) for SAM decomposed relative positions.

    Returns (B, HP, WP, dim).
    """
    b, hp, wp, c3 = qkv.shape
    dim = c3 // 3
    hd = dim // num_heads
    hdp = -(-hd // 128) * 128  # lane-pad each head to the MXU tile
    if window:
        ah = aw = window
        gh, gw = hp // window, wp // window
    else:
        ah, aw = hp, wp
        gh = gw = 1
    nw, n = gh * gw, ah * aw
    ch = num_heads * 3 * hdp
    # heads per program: amortize grid-step overhead while keeping the
    # input block (n, hpp*3*hdp) comfortably inside VMEM double-buffering.
    hpp = 1
    for cand in (2, 4, 8):
        if num_heads % cand == 0 and n * cand * 3 * hdp * 2 <= 4 << 20:
            hpp = cand

    # head-major lane-padded, then window-major: (B, nw, N, heads*3*hdp)
    q6 = qkv.reshape(b, hp, wp, 3, num_heads, hd)
    q6 = jnp.transpose(q6, (0, 1, 2, 4, 3, 5))
    if hdp != hd:
        q6 = jnp.pad(q6, ((0, 0),) * 5 + ((0, hdp - hd),))
    arr = q6.reshape(b, hp, wp, ch)
    if window:
        arr = arr.reshape(b, gh, ah, gw, aw, ch)
        arr = jnp.transpose(arr, (0, 1, 3, 2, 4, 5))
    arr = arr.reshape(b, nw, n, ch)

    in_specs = [
        pl.BlockSpec((1, 1, n, hpp * 3 * hdp), lambda i, j, h: (i, j, 0, h))
    ]
    operands = [arr]
    if rh is not None:
        consts = _rel_consts(ah, aw, hdp, rh, rw, qkv.dtype)
        for cst in consts:
            in_specs.append(pl.BlockSpec(cst.shape, lambda i, j, h: (0, 0)))
        operands.extend(consts)

    out = pl.pallas_call(
        _make_kernel(n, hdp, scale, rh is not None, hpp),
        out_shape=jax.ShapeDtypeStruct((b, nw, n, num_heads * hdp), qkv.dtype),
        grid=(b, nw, num_heads // hpp),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, n, hpp * hdp), lambda i, j, h: (i, j, 0, h)
        ),
        interpret=interpret,
    )(*operands)

    # window-major -> grid, drop the lane padding
    out = out.reshape(b, gh, gw, ah, aw, num_heads, hdp)[..., :hd]
    out = jnp.transpose(out, (0, 1, 3, 2, 4, 5, 6))
    return out.reshape(b, hp, wp, dim)
