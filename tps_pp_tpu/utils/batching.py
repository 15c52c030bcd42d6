"""Batch bucketing for jitted serving/eval paths.

XLA compiles one program per input shape; detection produces a different
crop count per image and eval loops end in a ragged batch. Padding the
leading axis up to the next power of two bounds the jit cache to
log2(N_max) programs. The torch reference needs no analog (dynamic batch
is free in eager CUDA).

Padding REPLICATES the last real row rather than inserting zeros: decode
loops with early-EOS exit (recognizer.greedy_decode) stop only when every
row emitted EOS, and a zero-feature garbage row may never emit one —
copies of a real row exit exactly when the real row does (same trick as
utils/export.ExportedRecognizer.simple_test).
"""
import jax.numpy as jnp


def next_pow2(n: int) -> int:
    return 1 << max(0, int(n) - 1).bit_length()


def pad_rows(arrays, n: int, m: int):
    """Pad axis 0 of each array in ``arrays`` from ``n`` to ``m`` rows by
    replicating the last row. No-op when ``m == n``."""
    if m == n:
        return tuple(arrays)
    return tuple(
        jnp.concatenate([a, jnp.repeat(a[-1:], m - n, axis=0)])
        for a in arrays)


def pad_rows_pow2(arrays, n: int):
    """Pad axis 0 from ``n`` to the next power of two (see pad_rows)."""
    return pad_rows(arrays, n, next_pow2(n))
