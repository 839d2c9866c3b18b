"""Device-side batch preprocessing.

The reference scatters its per-element transforms across seven ``tf.data``
maps with two host round-trips through ``tf.py_func``
(``/root/reference/dataloader/outdoor_data_mfcc.py:58-116``). Here the host
only decodes bytes; everything numeric — Butterworth "silence" branch, the
MFCC frontend, per-frame normalizations, and the correspondence
augmentation — is one jitted function over the whole batch, fused by XLA
and fed by the prefetching pipeline. Semantics are kept 1:1:

- acoustic per-frame min-max over (H,W,C)  (:672-679)
- mfcc per-frame min-max over the 12 coefs (:696-703)
- video: BGR channel flip then /255       (:649-655)
- correspondence: tile filtered MFCC to a fake acoustic image and double the
  batch with 1/0 labels (:888-928); no-video variant zeroes frames (:930-971)
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from acoustic_image_generation_tpu.dsp import iir
from acoustic_image_generation_tpu.dsp.mfcc import mfcc_from_frames


class Batch(NamedTuple):
    """Model-ready batch of frames (leading axis = B*frames when flattened)."""

    acoustic: jnp.ndarray  # (N, 36, 48, C) in [0,1]
    audio: jnp.ndarray  # (N, 1024) raw float waveform (spectrogram source)
    mfcc: jnp.ndarray  # (N, 12) in [0,1]
    video: jnp.ndarray  # (N, 224, 298, 3) in [0,1]
    action: jnp.ndarray  # (N,) int32
    location: jnp.ndarray  # (N,) int32
    filtered_mfcc: jnp.ndarray  # (N, 12) in [0,1]
    correspondence: jnp.ndarray | None = None  # (N, 2) one-hot when enabled


def minmax_frame(x: jnp.ndarray, axes) -> jnp.ndarray:
    """Reference min-max: shift by min, divide by max of the shifted value."""
    x = x - jnp.min(x, axis=axes, keepdims=True)
    return x / jnp.max(x, axis=axes, keepdims=True)


def normalize_acoustic(acoustic: jnp.ndarray) -> jnp.ndarray:
    """(N,36,48,C) raw -> [0,1] per frame (outdoor_data_mfcc.py:672-679)."""
    return minmax_frame(acoustic.astype(jnp.float32), axes=(-3, -2, -1))


def normalize_mfcc(coeffs: jnp.ndarray) -> jnp.ndarray:
    """(N,12) -> [0,1] per frame (outdoor_data_mfcc.py:696-703)."""
    return minmax_frame(coeffs, axes=(-1,))


def normalize_video(video: jnp.ndarray) -> jnp.ndarray:
    """uint8 BGR flip + scale (outdoor_data_mfcc.py:649-655)."""
    return video[..., ::-1].astype(jnp.float32) * (1.0 / 255.0)


def preprocess_batch(
    acoustic_raw: jnp.ndarray,  # (N, 36, 48, C) float32
    audio_raw: jnp.ndarray,  # (N, 1024) int32
    video_raw: jnp.ndarray,  # (N, 224, 298, 3) uint8
    action: jnp.ndarray,  # (N,) int32
    location: jnp.ndarray,  # (N,) int32
    *,
    lowpass_on_device: bool = True,
    filtered_audio: jnp.ndarray | None = None,
    compute_filtered: bool = True,
    use_pallas_mfcc: bool = False,
) -> Batch:
    """Raw decoded frames -> model-ready batch. Jit-friendly (static shapes).

    ``compute_filtered=False`` skips the Butterworth "silence" branch (a
    1024-step sequential IIR scan) — it only feeds the correspondence
    augmentation and the Flickr ``filtered`` output, so recipes that use
    neither shouldn't pay for it."""
    wav = audio_raw.astype(jnp.float32)
    if use_pallas_mfcc:
        from acoustic_image_generation_tpu.ops.pallas_mfcc import mfcc_pallas

        _mfcc = mfcc_pallas
    else:
        _mfcc = mfcc_from_frames
    coeffs = _mfcc(wav)

    if compute_filtered:
        if filtered_audio is not None:
            filtered = filtered_audio.astype(jnp.float32)
        elif lowpass_on_device:
            filtered = iir.filtfilt_jax(wav)
        else:
            raise ValueError("filtered_audio required when lowpass_on_device=False")
        filtered_coeffs = normalize_mfcc(_mfcc(filtered))
    else:
        filtered_coeffs = jnp.zeros_like(coeffs)

    return Batch(
        acoustic=normalize_acoustic(acoustic_raw),
        audio=wav,
        mfcc=normalize_mfcc(coeffs),
        video=normalize_video(video_raw),
        action=action.astype(jnp.int32),
        location=location.astype(jnp.int32),
        filtered_mfcc=filtered_coeffs,
    )


def tile_mfccmap(mfcc: jnp.ndarray, h: int = 36, w: int = 48) -> jnp.ndarray:
    """(N,12) -> (N,36,48,12) constant spatial map (mfcctrainer.py:38-40)."""
    n = mfcc.shape[0]
    return jnp.broadcast_to(mfcc[:, None, None, :], (n, h, w, mfcc.shape[-1]))


def correspondence_augment(batch: Batch) -> Batch:
    """Double the batch with non-corresponding (silence-map) examples
    (outdoor_data_mfcc.py:888-928). First half label 1, second half 0."""
    fake_acoustic = tile_mfccmap(batch.filtered_mfcc)
    n = batch.acoustic.shape[0]
    labels = jnp.concatenate([jnp.ones((n,), jnp.int32), jnp.zeros((n,), jnp.int32)])
    onehot = jnp.eye(2, dtype=jnp.float32)[labels]
    return Batch(
        acoustic=jnp.concatenate([batch.acoustic, fake_acoustic]),
        audio=jnp.concatenate([batch.audio, batch.audio]),
        mfcc=jnp.concatenate([batch.mfcc, batch.filtered_mfcc]),
        video=jnp.concatenate([batch.video, batch.video]),
        action=jnp.concatenate([batch.action, batch.action]),
        location=jnp.concatenate([batch.location, batch.location]),
        filtered_mfcc=jnp.concatenate([batch.filtered_mfcc, batch.filtered_mfcc]),
        correspondence=onehot,
    )


def correspondence_augment_no_video(batch: Batch) -> Batch:
    """Variant that zeroes the video frames of the non-corresponding half
    and keeps real acoustic images (outdoor_data_mfcc.py:930-971)."""
    n = batch.acoustic.shape[0]
    labels = jnp.concatenate([jnp.ones((n,), jnp.int32), jnp.zeros((n,), jnp.int32)])
    onehot = jnp.eye(2, dtype=jnp.float32)[labels]
    return Batch(
        acoustic=jnp.concatenate([batch.acoustic, batch.acoustic]),
        audio=jnp.concatenate([batch.audio, batch.audio]),
        mfcc=jnp.concatenate([batch.mfcc, batch.mfcc]),
        video=jnp.concatenate([batch.video, jnp.zeros_like(batch.video)]),
        action=jnp.concatenate([batch.action, batch.action]),
        location=jnp.concatenate([batch.location, batch.location]),
        filtered_mfcc=jnp.concatenate([batch.filtered_mfcc, batch.filtered_mfcc]),
        correspondence=onehot,
    )


def correspondence_shuffle(
    batch: Batch, key, *, frames: int = 1, final_shuffle: bool = True,
    valid_clips=None,
) -> Batch:
    """Shuffled-pair correspondence of the AVIA/music loader
    (outdoor_data.py:854-902): double the batch; the first half keeps
    aligned (audio, video) pairs (label 1), the second half pairs each
    video with a randomly shuffled element's audio/acoustic — its label is
    1 only when the shuffled partner shares both action and location.
    The whole doubled batch is then permuted with a second key
    (``final_shuffle``; the eval path disables it so the trainer's
    per-half valid-prefix mask stays correct on padded remainder batches —
    eval metrics are permutation-invariant, so this changes nothing else).

    ``batch.action``/``location`` carry the AUDIO side's labels for the
    shuffled half (the reference emits separate video/audio label tensors,
    ``outdoor_data.py:869-874``; the video-side labels equal the first
    half's and are recoverable from the pairing when needed).

    ``frames``: rows per clip. The reference shuffles whole batch elements
    (each a full 12-frame sample); with flattened frame rows the
    permutations here act on clip blocks so clips stay contiguous for the
    12-frame DualCamNet / clip_logits consumers."""
    import jax

    n = batch.acoustic.shape[0]
    assert n % frames == 0, (n, frames)
    c = n // frames
    k1, k2 = jax.random.split(key)

    def expand(clip_perm):
        return (clip_perm[:, None] * frames + jnp.arange(frames)[None, :]).reshape(-1)

    if valid_clips is None:
        perm = expand(jax.random.permutation(k1, c))
    else:
        # Padded remainder batch (eval): permute only among the first
        # ``valid_clips`` real clips so no real row is paired with a
        # zero-filled padding partner; padded positions map to
        # themselves. argsort of keyed ranks keeps this jit-safe with a
        # dynamic ``valid_clips``.
        r = jax.random.uniform(k1, (c,))
        ranks = jnp.where(
            jnp.arange(c) < valid_clips,
            r,
            2.0 + jnp.arange(c, dtype=jnp.float32),
        )
        perm = expand(jnp.argsort(ranks))
    action2 = batch.action[perm]
    location2 = batch.location[perm]
    labels2 = ((batch.action == action2) & (batch.location == location2)).astype(jnp.int32)
    labels = jnp.concatenate([jnp.ones((n,), jnp.int32), labels2])
    onehot = jnp.eye(2, dtype=jnp.float32)[labels]

    doubled = Batch(
        acoustic=jnp.concatenate([batch.acoustic, batch.acoustic[perm]]),
        audio=jnp.concatenate([batch.audio, batch.audio[perm]]),
        mfcc=jnp.concatenate([batch.mfcc, batch.mfcc[perm]]),
        video=jnp.concatenate([batch.video, batch.video]),
        action=jnp.concatenate([batch.action, action2]),
        location=jnp.concatenate([batch.location, location2]),
        filtered_mfcc=jnp.concatenate([batch.filtered_mfcc, batch.filtered_mfcc[perm]]),
        correspondence=onehot,
    )
    if not final_shuffle:
        return doubled
    final = expand(jax.random.permutation(k2, 2 * c))
    return Batch(*[x[final] if x is not None else None for x in doubled])
