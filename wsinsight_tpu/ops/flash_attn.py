"""Fused window attention for the SAM/ViT encoders (pallas, TPU).

The reference executes CellViT attention inside opaque TorchScript
(reference: modellib/run_inference.py:446-456 drives the forward); upstream
SAM materializes the (windows*B*heads, N, N) attention tensor in global
memory and adds decomposed rel-pos to it with two broadcast adds. On TPU
that layout churn — window partition/unpartition transposes, per-head
q/k/v transposes, and three HBM round-trips over the score tensor — costs
more than every matmul in the block combined (measured ~1.5-2.4 ms per
SAM-H windowed block at batch 8 vs ~0.5 ms of matmul work).

Design here: one (image, head) pair per grid step. The qkv grid is
re-laid out once in XLA to head-major lanes padded to the 128-lane MXU
tile — (B, HP, WP, heads * 3 * hdp) with hdp = ceil(hd / 128) * 128 — so
every block satisfies Mosaic's (8, 128) tiling rule, and the kernel walks
the windows with static in-VMEM slices. The whole attention core stays in
VMEM:

- No partition/unpartition or per-head transposes ever hit HBM.
- Decomposed rel-pos is computed on the MXU from three small constant
  matrices (a one-hot row selector, the Toeplitz-expanded table, a one-hot
  column expander), so the (N, N) score tensor never leaves VMEM and the
  broadcast adds disappear:
      rel_h[(qh,qw), (kh,kw)] = sum_c q[(qh,qw),c] * Rh[qh,kh,c]
                              = ((tile(q) * Mh) @ Wh @ Eh)[(qh,qw), (kh,kw)]
  with Mh[(qh,qw),(j,c)] = [j==qh], Wh[(j,c),kh] = Rh[j,kh,c],
  Eh[kh,(kh',kw)] = [kh==kh'].
- Softmax runs in f32 in VMEM; only the output grid is written back.

Numerics match the unfused formulation to f32 rounding (same contraction
dtype, same f32 softmax); with bf16 activations the rel values round to
bf16 before the score accumulate (<=1e-3 absolute on normalized scores,
validated against the XLA path in tests/test_flash_attn.py).
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
    """Constant matrices that turn decomposed rel-pos into two matmuls.

    rh: (ah, ah, hd) table with rh[qh, kh] = rel_pos_h[qh - kh + ah - 1];
    rw likewise over (aw, aw, hd). Token order is row-major (qh major).
    Tables are zero-padded to hdp channels to match the kernel layout.
    """
    n = ah * aw
    hd = rh.shape[-1]
    # row selectors: M[(qh,qw), (j,c)] = [j == qh] (resp. qw)
    mh = np.kron(np.eye(ah, dtype=np.float32), np.ones((aw, 1), np.float32))
    mh = np.repeat(mh, hdp, axis=1)  # (n, ah*hdp)
    mw = np.tile(np.eye(aw, dtype=np.float32), (ah, 1))
    mw = np.repeat(mw, hdp, axis=1)  # (n, aw*hdp)
    # tables: W[(j,c), k] = R[j, k, c], channel-padded
    rh = jnp.pad(jnp.asarray(rh), ((0, 0), (0, 0), (0, hdp - hd)))
    rw = jnp.pad(jnp.asarray(rw), ((0, 0), (0, 0), (0, hdp - hd)))
    wh = rh.transpose(0, 2, 1).reshape(ah * hdp, ah)
    ww = rw.transpose(0, 2, 1).reshape(aw * hdp, aw)
    # column expanders: E[k, (kh,kw)] = [k == kh] (resp. kw)
    eh = np.repeat(np.eye(ah, dtype=np.float32), aw, axis=1)  # (ah, n)
    ew = np.tile(np.eye(aw, dtype=np.float32), (1, ah))  # (aw, n), kh-major
    return (
        jnp.asarray(mh, dtype),
        jnp.asarray(mw, dtype),
        wh.astype(dtype),
        ww.astype(dtype),
        jnp.asarray(eh, dtype),
        jnp.asarray(ew, dtype),
    )


def _one_window(q, k, v, scale, rel, f32=jnp.float32):
    """(n, hdp) q/k/v -> (n, hdp) attention output, all in VMEM."""
    s = jax.lax.dot_general(
        q * jnp.asarray(scale, q.dtype), k,
        (((1,), (1,)), ((), ())), preferred_element_type=f32,
    )
    if rel is not None:
        mh, mw, wh, ww, eh, ew = rel
        ah = wh.shape[-1]
        aw = ww.shape[-1]
        qt_h = jnp.concatenate([q] * ah, axis=1) * mh
        rel_h = jax.lax.dot_general(
            qt_h, wh, (((1,), (0,)), ((), ())), preferred_element_type=f32
        ).astype(q.dtype)
        s += jax.lax.dot_general(
            rel_h, eh, (((1,), (0,)), ((), ())), preferred_element_type=f32
        )
        qt_w = jnp.concatenate([q] * aw, axis=1) * mw
        rel_w = jax.lax.dot_general(
            qt_w, ww, (((1,), (0,)), ((), ())), preferred_element_type=f32
        ).astype(q.dtype)
        s += jax.lax.dot_general(
            rel_w, ew, (((1,), (0,)), ((), ())), preferred_element_type=f32
        )
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    return jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=f32
    )


def _make_kernel(window: int, hp: int, wp: int, hdp: int, scale: float):
    gh = hp // window if window else 1
    gw = wp // window if window else 1
    ah = window or hp
    aw = window or wp
    n = ah * aw

    def kernel(qkv_ref, *rest):
        o_ref = rest[-1]
        rel = tuple(r[...] for r in rest[:-1]) if len(rest) > 1 else None
        for wi in range(gh):
            for wj in range(gw):
                blk = qkv_ref[0, wi * ah:(wi + 1) * ah, wj * aw:(wj + 1) * aw, :]
                q = blk[..., 0:hdp].reshape(n, hdp)
                k = blk[..., hdp:2 * hdp].reshape(n, hdp)
                v = blk[..., 2 * hdp:3 * hdp].reshape(n, hdp)
                out = _one_window(q, k, v, scale, rel)
                o_ref[0, wi * ah:(wi + 1) * ah, wj * aw:(wj + 1) * aw, :] = (
                    out.astype(o_ref.dtype).reshape(ah, aw, hdp)
                )

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
    ah = window or hp
    aw = window or wp

    # head-major, lane-padded layout: (B, HP, WP, heads * 3 * hdp)
    q6 = qkv.reshape(b, hp, wp, 3, num_heads, hd)
    q6 = jnp.transpose(q6, (0, 1, 2, 4, 3, 5))
    if hdp != hd:
        q6 = jnp.pad(q6, ((0, 0),) * 5 + ((0, hdp - hd),))
    arr = q6.reshape(b, hp, wp, num_heads * 3 * hdp)

    kernel = _make_kernel(window, hp, wp, hdp, scale)
    qkv_spec = pl.BlockSpec((1, hp, wp, 3 * hdp), lambda i, h: (i, 0, 0, h))
    o_spec = pl.BlockSpec((1, hp, wp, hdp), lambda i, h: (i, 0, 0, h))
    operands = [arr]
    in_specs = [qkv_spec]
    if rh is not None:
        consts = _rel_consts(ah, aw, hdp, rh, rw, qkv.dtype)
        for cst in consts:
            in_specs.append(pl.BlockSpec(cst.shape, lambda i, h: (0, 0)))
        operands.extend(consts)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, num_heads * hdp), qkv.dtype),
        grid=(b, num_heads),
        in_specs=in_specs,
        out_specs=o_spec,
        interpret=interpret,
    )(*operands)
    if hdp != hd:
        out = out.reshape(b, hp, wp, num_heads, hdp)[..., :hd]
    return out.reshape(b, hp, wp, dim)
