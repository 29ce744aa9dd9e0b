"""int8 query-wire codec: per-block bf16 scales packed into ONE buffer.

Why this exists (NOTES_ROUND5 R5j/R5k): after the process's first d2h
fetch the relay runs every h2d at ~34 MB/s with a ~25-45 ms per-transfer
handshake. The grouped search uploads one query block per super-chunk,
so (a) wire BYTES dominate pass time — int8 is 4x fewer than f32 — and
(b) a SECOND per-chunk put (e.g. a separate f32 scale vector) costs more
than the bytes it carries: measured int8-with-separate-scales arms ran
SLOWER than f32 (benchmarks/wire_ab.py). Hence this codec:

  - queries are quantized per BLOCK of QBLOCK=8 components with a bf16
    scale each (symmetric, scale = blockmax/127, rounded to bf16; qi is
    computed against the ROUNDED scale so host and device agree
    bitwise). Block scales track local magnitude: the per-ROW-scale
    rung measured recall 0.9931 at 100k clustered and 16-component f32
    blocks 0.9951 — both under/at the 0.995 tune gate; 8-component
    blocks cut the error another ~1.5-2x at the same byte overhead as
    16-component f32 scales (2 B vs 4 B per block);
  - the bf16 scales are appended as trailing rows of the SAME int8
    buffer — one put per super-chunk, +25% bytes over bare int8
    (total 160 B/query at D=128 vs bf16's 256 B);
  - the device program's prologue (decode_int8_queries) rebuilds f32
    scales from the bytes (bf16 bits are the top half of f32: one
    shift + bitcast) and dequantizes: qi.astype(f32) * scale — exact
    f32 arithmetic, bit-identical to the host simulation
    (roundtrip_int8) that tune_search_ef validates recall with.

Wire layout for R queries of padded dim DP (DP % 128 == 0):
  rows [0, R):       int8 quantized queries [R, DP]
  rows [R, R + SR):  the [R, DP/QBLOCK] bf16 scale matrix, row-major
                     little-endian bytes, zero-padded to fill
                     SR = ceil(R * (DP/QBLOCK) * 2 / DP) rows.
"""
from __future__ import annotations

import ml_dtypes
import numpy as np

QBLOCK = 8  # components per quantization block


def scale_rows(r: int, dp: int) -> int:
    """Trailing buffer rows holding the packed bf16 block scales."""
    return -(-r * (dp // QBLOCK) * 2 // dp)


def quantize_block_int8(qp: np.ndarray):
    """[R, DP] f32 -> (qi int8 [R, DP], effective scales f32 [R, DP/QB]).

    The returned scales are the bf16-ROUNDED values (as f32) — exactly
    what the device will decode — and qi is quantized against them, so
    qi * scales reproduces the device arithmetic bit-for-bit."""
    r, dp = qp.shape
    nb = dp // QBLOCK
    blocks = qp.reshape(r, nb, QBLOCK)
    amax = np.abs(blocks).max(axis=2)
    scales = (np.where(amax > 0, amax, 1.0) / 127.0).astype(np.float32)
    scales = scales.astype(ml_dtypes.bfloat16).astype(np.float32)
    qi = np.clip(np.rint(blocks / scales[:, :, None]), -127,
                 127).astype(np.int8)
    return qi.reshape(r, dp), scales


def roundtrip_int8(qp: np.ndarray) -> np.ndarray:
    """Host simulation of the wire: quantize + dequantize in f32 — the
    exact values the device kernel will score with (tune_search_ef's
    recall-gate input). Accepts any dim: pads to a QBLOCK multiple the
    way the device path's lane padding does (zero blocks quantize to
    zero, so extra padding never changes the real components)."""
    r, d = qp.shape
    dp = -(-d // QBLOCK) * QBLOCK
    if dp != d:
        padded = np.zeros((r, dp), dtype=np.float32)
        padded[:, :d] = qp
        qp = padded
    qi, scales = quantize_block_int8(qp)
    back = (qi.reshape(r, dp // QBLOCK, QBLOCK).astype(np.float32)
            * scales[:, :, None]).reshape(r, dp)
    return back[:, :d]


def encode_int8_queries(qp: np.ndarray) -> np.ndarray:
    """[R, DP] f32 -> ONE packed int8 buffer [R + scale_rows, DP]."""
    r, dp = qp.shape
    qi, scales = quantize_block_int8(qp)
    sr = scale_rows(r, dp)
    tail = np.zeros(sr * dp, dtype=np.int8)
    sb = (scales.astype(ml_dtypes.bfloat16)
          .reshape(-1).view(np.uint8))  # little-endian bf16 bytes
    tail[: sb.size] = sb.view(np.int8)
    return np.concatenate([qi, tail.reshape(sr, dp)], axis=0)


def decode_int8_queries(buf, r: int, dp: int):
    """Device-side decode (inside jit): packed buffer -> [R, DP] f32.

    bf16 bits are the high half of f32 bits, so scale reconstruction is
    two byte-ORs, one shift and a bitcast — a few VPU ops over
    R * DP/QBLOCK elements, noise next to the scan/traversal after it.
    """
    import jax
    import jax.numpy as jnp

    nb = dp // QBLOCK
    qi = buf[:r]
    sb = (buf[r:].reshape(-1)[: r * nb * 2].reshape(r * nb, 2)
          .astype(jnp.int32) & 0xFF).astype(jnp.uint32)
    bits = (sb[:, 0] | (sb[:, 1] << 8)) << 16
    scales = jax.lax.bitcast_convert_type(bits, jnp.float32)
    q = (qi.reshape(r, nb, QBLOCK).astype(jnp.float32)
         * scales.reshape(r, nb)[:, :, None])
    return q.reshape(r, dp)
