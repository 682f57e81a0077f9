"""Batched, masked spectral primitives for the signal-processing front-end.

The reference front-end (quality_gates.py, audio_conditioning.py) runs
librosa/scipy per sample on the host, forcing a device→host→device round
trip inside the audio encoder's forward
(/root/reference/src/models/audio_encoder.py:65-88). Here every primitive
is a pure jittable function over fixed-shape padded [B, T] waveforms with
validity masks, so the whole front-end fuses into the device compute graph.

Conventions: `mask` is [B, T] float {0,1}; all per-utterance statistics are
masked reductions over valid samples/frames only, reproducing the
reference's per-sample unpadded semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def hann_window(n: int) -> np.ndarray:
    """Periodic Hann window (scipy.signal.get_window('hann', n))."""
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)).astype(np.float32)


def frame_signal(wave: Array, frame_length: int, hop: int) -> Array:
    """[B, T] -> [B, F, frame_length] by strided gather (no centering)."""
    T = wave.shape[-1]
    num_frames = max(1 + (T - frame_length) // hop, 1)
    idx = np.arange(num_frames)[:, None] * hop + np.arange(frame_length)[None, :]
    idx = np.minimum(idx, T - 1)
    return wave[..., idx]


def frame_valid_mask(mask: Array, frame_length: int, hop: int,
                     min_coverage: float = 0.5) -> Array:
    """[B, T] sample mask -> [B, F] frame validity (frame mostly valid)."""
    frames = frame_signal(mask, frame_length, hop)
    return (frames.mean(axis=-1) >= min_coverage).astype(mask.dtype)


def center_frame_mask(mask: Array, hop: int, num_frames: int) -> Array:
    """Exact frame set of a CENTERED framing of the unpadded signal:
    frame i exists iff i*hop <= valid_len (librosa yields 1 + L//hop
    frames). Guarantees padding invariance of downstream masked stats."""
    valid_len = mask.sum(axis=-1, keepdims=True)
    starts = jnp.arange(num_frames, dtype=mask.dtype)[None, :] * hop
    return (starts <= valid_len).astype(mask.dtype)


def full_frame_mask(mask: Array, frame_length: int, hop: int,
                    num_frames: int) -> Array:
    """Exact frame set of an UNCENTERED framing of the unpadded signal:
    frame i exists iff i*hop + frame_length <= valid_len."""
    valid_len = mask.sum(axis=-1, keepdims=True)
    ends = (jnp.arange(num_frames, dtype=mask.dtype)[None, :] * hop
            + frame_length)
    out = (ends <= valid_len).astype(mask.dtype)
    # degenerate short rows: keep frame 0
    return out.at[..., 0].set(jnp.maximum(out[..., 0], 1.0))


# --------------------------------------------------------------- framed DFT
#
# XLA's TPU FFT runs on the VPU and measured ~6 ms per direction for the
# denoiser's [128, 253, 1024] frames (v5e, /tmp probe recorded in
# docs/PERFORMANCE.md). Frame-sized transforms (n <= 4096) are instead
# computed as real DFT MATMULS on the MXU: X = frames @ cos + i(frames @
# (-sin)), ~68 GFLOP per direction at the denoiser shape — a few ms at
# Precision.HIGH (bf16x3 passes, ~f32 accuracy: rel err ~1e-6, far below
# every spectral tolerance in the test suite). Full-length transforms
# (the notch/HPF 64 k-point round trip) keep jnp.fft — an O(n²) matmul
# would lose there. CPU keeps pocketfft (fast, exact); tests force the
# matmul path explicitly to pin its parity against jnp.fft.

_DFT_MATMUL_MAX_N = 4096
_FORCE_DFT_MATMUL = False  # tests flip this to exercise the TPU path on CPU


def _use_dft_matmul(n: int) -> bool:
    if n > _DFT_MATMUL_MAX_N:
        return False
    if _FORCE_DFT_MATMUL:
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


@functools.lru_cache(maxsize=8)
def _dft_basis(n: int):
    """Real-DFT analysis basis: cos/-sin [n, n//2+1] (numpy f32)."""
    ang = 2.0 * np.pi * np.outer(np.arange(n), np.arange(n // 2 + 1)) / n
    return (np.cos(ang).astype(np.float32),
            (-np.sin(ang)).astype(np.float32))


@functools.lru_cache(maxsize=8)
def _idft_basis(n: int):
    """Real-DFT synthesis basis [n//2+1, n] pair (for Re and Im parts):
    x[t] = Σ_k w_k (Re X[k] cos(2πkt/n) - Im X[k] sin(2πkt/n)),
    w = [1, 2, ..., 2, 1] / n (hermitian-symmetry fold)."""
    k = np.arange(n // 2 + 1)
    w = np.full(n // 2 + 1, 2.0 / n)
    w[0] = 1.0 / n
    if n % 2 == 0:
        # the Nyquist bin is unpaired only for even n; for odd n the last
        # rfft bin is conjugate-paired and keeps weight 2/n
        w[-1] = 1.0 / n
    ang = 2.0 * np.pi * np.outer(k, np.arange(n)) / n
    return ((w[:, None] * np.cos(ang)).astype(np.float32),
            (-(w[:, None]) * np.sin(ang)).astype(np.float32))


def _dft_dot(a: Array, b: np.ndarray) -> Array:
    return jax.lax.dot_general(
        a, jnp.asarray(b), (((a.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGH)


def framed_rfft(frames: Array) -> tuple[Array, Array]:
    """(re, im) of rfft over the last axis; MXU matmul-DFT on TPU for
    frame-sized n, jnp.fft elsewhere. frames: [..., n] f32."""
    n = frames.shape[-1]
    if _use_dft_matmul(n):
        c, s = _dft_basis(n)
        return _dft_dot(frames, c), _dft_dot(frames, s)
    spec = jnp.fft.rfft(frames, axis=-1)
    return spec.real, spec.imag


def framed_irfft(re: Array, im: Array, n: int) -> Array:
    """Inverse of framed_rfft: [..., n//2+1] (re, im) -> [..., n]."""
    if _use_dft_matmul(n):
        ci, si = _idft_basis(n)
        return _dft_dot(re, ci) + _dft_dot(im, si)
    return jnp.fft.irfft(re + 1j * im, n=n, axis=-1)


def stft_mag(wave: Array, *, n_fft: int = 2048, hop: int = 512,
             center: bool = True) -> Array:
    """Magnitude STFT, librosa semantics (hann window, reflect-pad center).

    [B, T] -> [B, F, n_fft//2 + 1].
    """
    if center:
        wave = jnp.pad(wave, [(0, 0)] * (wave.ndim - 1) + [(n_fft // 2, n_fft // 2)],
                       mode="reflect")
    frames = frame_signal(wave, n_fft, hop)
    win = jnp.asarray(hann_window(n_fft))
    re, im = framed_rfft(frames * win)
    return jnp.sqrt(re * re + im * im)


def stft_frame_mask(mask: Array, *, n_fft: int = 2048, hop: int = 512,
                    center: bool = True) -> Array:
    """Exact frame validity aligned with stft_mag's framing (padding-
    invariant: the frame set equals what the unpadded signal would have)."""
    T = mask.shape[-1]
    if center:
        num_frames = max(1 + (T + 2 * (n_fft // 2) - n_fft) // hop, 1)
        return center_frame_mask(mask, hop, num_frames)
    num_frames = max(1 + (T - n_fft) // hop, 1)
    return full_frame_mask(mask, n_fft, hop, num_frames)


def rms_frames(wave: Array, *, frame_length: int, hop: int) -> Array:
    """Per-frame RMS energy (librosa.feature.rms semantics, center=True,
    zero padding). [B, T] -> [B, F].

    Computed from cumulative sums of squares: one [B, T] pass plus a few
    F-sized scalar gathers, instead of materializing the
    [B, F, frame_length] strided-frame gather (which re-reads each sample
    frame_length/hop times — 2.5-4x the signal for the VAD/laughter
    framings). The zero padding is realized by clamping the prefix
    lookups to [0, T], which is exact: padded samples contribute zero.

    The prefix sums are CHUNK-LOCAL (reset every `chunk` samples): a
    global f32 cumsum over a 30 s clip reaches ~1e5, so differencing it
    for a quiet frame cancels catastrophically (RMS floor ~1e-2 instead
    of 0, enough to drift the VAD threshold). A frame spans at most two
    chunks (frame_length <= chunk), so each frame sum is at most
    (tail of chunk k) + (head of chunk k+1) — every subtraction stays at
    chunk-local magnitude and the rounding error is T-independent."""
    T = wave.shape[-1]
    pad = frame_length // 2
    num_frames = max(1 + (T + 2 * pad - frame_length) // hop, 1)
    chunk = 4096
    assert frame_length <= chunk, frame_length
    K = max(-(-T // chunk), 1)
    x2 = jnp.square(wave.astype(jnp.float32))
    x2 = jnp.pad(x2, [(0, 0)] * (x2.ndim - 1) + [(0, K * chunk - T)])
    x2 = x2.reshape(*x2.shape[:-1], K, chunk)
    cl = jnp.cumsum(x2, axis=-1)                       # within-chunk prefixes
    cl = jnp.concatenate([jnp.zeros_like(cl[..., :1]), cl], axis=-1)
    cl_flat = cl.reshape(*cl.shape[:-2], K * (chunk + 1))
    chunk_tot = cl[..., -1]                            # [..., K] exact sums

    starts = np.arange(num_frames) * hop - pad
    lo = np.clip(starts, 0, T)                         # prefix element counts
    hi = np.clip(starts + frame_length, 0, T)
    kb, ob = lo // chunk, lo % chunk
    ke = np.minimum(hi // chunk, K - 1)                # hi == K*chunk -> tail
    oe = hi - ke * chunk
    same = kb == ke                                    # static [F] bools
    head = cl_flat[..., ke * (chunk + 1) + oe]         # sum of chunk ke[:oe]
    tail_b = cl_flat[..., kb * (chunk + 1) + ob]       # sum of chunk kb[:ob]
    sumsq = jnp.where(same, head - tail_b,
                      (chunk_tot[..., kb] - tail_b) + head)
    return jnp.sqrt(jnp.maximum(sumsq, 0.0) / frame_length)


def masked_mean(x: Array, mask: Array, axis=-1, eps: float = 1e-10) -> Array:
    return (x * mask).sum(axis=axis) / (mask.sum(axis=axis) + eps)


def masked_var(x: Array, mask: Array, axis=-1, eps: float = 1e-10) -> Array:
    mu = masked_mean(x, mask, axis=axis, eps=eps)
    return masked_mean((x - jnp.expand_dims(mu, axis)) ** 2, mask, axis=axis,
                       eps=eps)


def masked_std(x: Array, mask: Array, axis=-1, eps: float = 1e-10) -> Array:
    return jnp.sqrt(masked_var(x, mask, axis=axis, eps=eps))


# Above this row length, masked_quantile switches from jnp.sort to an
# exact bit-level binary search: TPU sorts are bitonic (O(n log^2 n)
# memory passes — ~7 ms for [64, 64000] f32, the most expensive DSP
# reduction), while 32 rank-count passes over the same array are ~8x less
# traffic. Both paths return identical values (the search recovers true
# order statistics), so the switch is purely a performance decision.
_QUANTILE_BITSEARCH_MIN_N = 8192


def _float_order_key(x: Array) -> Array:
    """Monotonic uint32 key for f32 totals order: flip sign bit for
    non-negatives, all bits for negatives (the classic radix-sort map)."""
    u = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    neg = (u >> 31).astype(bool)
    return jnp.where(neg, ~u, u | jnp.uint32(0x80000000))


def _key_to_float(k: Array) -> Array:
    neg = ~(k >> 31).astype(bool)          # keys < 0x80000000 were negative
    u = jnp.where(neg, ~k, k & jnp.uint32(0x7FFFFFFF))
    return jax.lax.bitcast_convert_type(u, jnp.float32)


def _kth_smallest_key(keys: Array, target: Array) -> Array:
    """Per-row (target)-th smallest uint32 key (1-indexed target [B]) via
    lower-bound binary search on the key domain: smallest v with
    count(keys <= v) >= target. Lands exactly on an existing key."""
    B = keys.shape[0]
    lo = jnp.zeros((B,), jnp.uint32)
    hi = jnp.full((B,), 0xFFFFFFFF, jnp.uint32)

    def body(_, lh):
        lo, hi = lh
        mid = lo + (hi - lo) // 2
        cnt = (keys <= mid[:, None]).sum(axis=-1)
        take = cnt >= target
        return jnp.where(take, lo, mid + 1), jnp.where(take, mid, hi)

    lo, hi = jax.lax.fori_loop(0, 32, body, (lo, hi))
    return hi


def _masked_quantile_bitsearch(x: Array, mask: Array, q: float) -> Array:
    N = x.shape[-1]
    big = jnp.finfo(jnp.float32).max
    keys = _float_order_key(jnp.where(mask > 0, x.astype(jnp.float32), big))
    n = mask.sum(axis=-1)
    pos = q * jnp.maximum(n - 1.0, 0.0)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, N - 1)
    hi = jnp.clip(lo + 1, 0, N - 1)
    frac = (pos - lo.astype(pos.dtype)).astype(jnp.float32)

    vlo_key = _kth_smallest_key(keys, lo + 1)
    # rank lo+2 from vlo's key: duplicates of vlo spanning the next rank
    # mean vhi == vlo; otherwise vhi is the smallest key strictly greater
    cnt_le = (keys <= vlo_key[:, None]).sum(axis=-1)
    gt = jnp.where(keys > vlo_key[:, None], keys, jnp.uint32(0xFFFFFFFF))
    next_key = gt.min(axis=-1)
    vhi_key = jnp.where(cnt_le >= lo + 2, vlo_key, next_key)

    vlo = _key_to_float(vlo_key)
    vhi = _key_to_float(vhi_key)
    vhi = jnp.where(hi.astype(pos.dtype) <= pos, vlo, vhi)  # guard n==1 rows
    return (vlo + frac * (vhi - vlo)).astype(x.dtype)


def masked_quantile(x: Array, mask: Array, q: float) -> Array:
    """Per-row quantile over valid entries (linear interpolation, matching
    np.percentile). x, mask: [B, N] -> [B]."""
    # The bitsearch path operates on f32 bit patterns, so it is exact only
    # for f32 input; other float dtypes keep the dtype-faithful sort path
    # regardless of row length (a f64/bf16 caller must not silently change
    # numerics at the length threshold).
    if (x.ndim == 2 and x.shape[-1] >= _QUANTILE_BITSEARCH_MIN_N
            and x.dtype == jnp.float32):
        return _masked_quantile_bitsearch(x, mask, q)
    big = jnp.finfo(x.dtype).max
    xs = jnp.sort(jnp.where(mask > 0, x, big), axis=-1)
    n = mask.sum(axis=-1)
    pos = q * jnp.maximum(n - 1.0, 0.0)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, x.shape[-1] - 1)
    hi = jnp.clip(lo + 1, 0, x.shape[-1] - 1)
    frac = pos - lo.astype(pos.dtype)
    vlo = jnp.take_along_axis(xs, lo[:, None], axis=-1)[:, 0]
    vhi = jnp.take_along_axis(xs, hi[:, None], axis=-1)[:, 0]
    vhi = jnp.where(hi.astype(pos.dtype) <= pos, vlo, vhi)  # guard n==1 rows
    return vlo + frac * (vhi - vlo)


def median_smooth_bool(x: Array, size: int = 5) -> Array:
    """Median filter over a boolean sequence == windowed majority vote
    (scipy.ndimage.median_filter(size) on {0,1}, reflect boundary)."""
    pad = size // 2
    xp = jnp.pad(x.astype(jnp.float32),
                 [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="edge")
    kernel = jnp.ones((size,), jnp.float32)
    summed = jax.vmap(lambda r: jnp.convolve(r, kernel, mode="valid"))(xp)
    return summed > (size / 2.0)


def welch_psd(wave: Array, mask: Array, *, sample_rate: int,
              nperseg: int = 2048) -> tuple[np.ndarray, Array]:
    """Batched masked Welch PSD (scipy.signal.welch semantics: hann window,
    50% overlap, constant detrend, density scaling).

    Returns (freqs [n_bins] np, psd [B, n_bins]).
    """
    T = wave.shape[-1]
    nperseg = min(nperseg, T)
    hop = nperseg // 2
    frames = frame_signal(wave, nperseg, hop)                    # [B, F, n]
    fmask = full_frame_mask(mask, nperseg, hop, frames.shape[-2])
    frames = frames - frames.mean(axis=-1, keepdims=True)        # detrend
    win = jnp.asarray(hann_window(nperseg))
    re, im = framed_rfft(frames * win)
    spec = re * re + im * im                                     # [B, F, bins]
    scale = 1.0 / (sample_rate * float((hann_window(nperseg) ** 2).sum()))
    spec = spec * scale
    spec = spec.at[..., 1:-1].mul(2.0)
    psd = masked_mean(spec, fmask[..., None], axis=-2)           # avg segments
    freqs = np.fft.rfftfreq(nperseg, d=1.0 / sample_rate)
    return freqs, psd


@functools.partial(jax.jit, static_argnames=("sample_rate", "n_fft", "hop"))
def spectral_descriptors(wave: Array, mask: Array, *, sample_rate: int = 16000,
                         n_fft: int = 2048, hop: int = 512,
                         S: Array | None = None):
    """Masked means of librosa-style spectral centroid / rolloff (85%) /
    bandwidth over valid frames. [B, T] -> three [B] arrays.

    `S` lets the caller pass a precomputed centered stft_mag (one FFT
    pass shared across the gate battery)."""
    if S is None:
        S = stft_mag(wave, n_fft=n_fft, hop=hop)                 # [B, F, bins]
    fmask = stft_frame_mask(mask, n_fft=n_fft, hop=hop)          # [B, F]
    freqs = jnp.asarray(np.fft.rfftfreq(n_fft, d=1.0 / sample_rate),
                        dtype=S.dtype)
    norm = S.sum(axis=-1) + 1e-10
    centroid = (S * freqs).sum(axis=-1) / norm                   # [B, F]
    # rolloff: smallest freq with cumulative energy >= 0.85 * total
    cum = jnp.cumsum(S, axis=-1)
    reach = cum >= 0.85 * cum[..., -1:]
    roll_idx = jnp.argmax(reach, axis=-1)
    rolloff = freqs[roll_idx]
    bandwidth = jnp.sqrt(((freqs - centroid[..., None]) ** 2 * S).sum(-1) / norm)
    return (masked_mean(centroid, fmask), masked_mean(rolloff, fmask),
            masked_mean(bandwidth, fmask))
