"""Per-frame energy-overlay video rendering driver.

Port of the render loop of ``/root/reference/showvideo.py:201-233``: run
the generation model over a loader (AVE/VGGSound-style frame sequences),
invert each generated acoustic image to its spatial log-energy map
(``find_logen``, showvideo.py:330-358), bilinear-resize it to the
224x298 frame, and save one ``I_{:06d}.png`` per frame — the grayscale
video frame with the jet-colormapped energy alpha-blended at 0.7.
Stitch with any encoder (``ffmpeg -i I_%06d.png out.mp4``).
"""

from __future__ import annotations

import os

import jax
import numpy as np

from acoustic_image_generation_tpu.dsp.energy import find_logen


def render_video_overlays(
    task, state, loader, out_dir: str, *, alpha: float = 0.7, seed: int = 0
) -> list[str]:
    """Render every frame the loader yields. ``task`` must expose
    ``_forward`` returning a VaeOutput (GenerationTask does). Returns the
    written paths, numbered like the reference (I_000001.png...)."""
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from acoustic_image_generation_tpu.data import preprocess

    @jax.jit
    def step(params, batch_stats, raw, key):
        f = raw["acoustic"].shape[1]
        flat = lambda x: x.reshape(-1, *x.shape[2:])
        batch = preprocess.preprocess_batch(
            flat(raw["acoustic"]), flat(raw["audio"]), flat(raw["video"]),
            jnp.repeat(raw["action"], f), jnp.repeat(raw["location"], f),
        )
        out, _ = task._forward(params, batch_stats, batch, {"latent": key}, train=False)
        emap = find_logen(out.output.astype(jnp.float32))  # (N, 36, 48)
        h, w = batch.video.shape[1:3]
        emap = jax.image.resize(emap, (emap.shape[0], h, w), method="bilinear")
        return batch.video, emap

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    num = 1
    for i, raw_batch in enumerate(loader.batches(0)):
        raw = {
            "acoustic": raw_batch.acoustic,
            "audio": raw_batch.audio,
            "video": raw_batch.video,
            "action": raw_batch.action,
            "location": raw_batch.location,
        }
        key = jax.random.fold_in(jax.random.key(seed), i)
        video, emap = jax.device_get(
            step(state.params, state.batch_stats, raw, key)
        )
        f = raw_batch.acoustic.shape[1]
        n_real = raw_batch.valid * f
        for frame, m in zip(np.asarray(video)[:n_real], np.asarray(emap)[:n_real]):
            h, w = frame.shape[:2]
            fig, ax = plt.subplots(figsize=(w / 100, h / 100), dpi=100)
            ax.imshow(frame.mean(axis=-1), cmap="gray")
            ax.imshow(m, cmap="jet", alpha=alpha)
            ax.axis("off")
            fig.subplots_adjust(0, 0, 1, 1)
            path = os.path.join(out_dir, f"I_{num:06d}.png")
            fig.savefig(path)
            plt.close(fig)
            paths.append(path)
            num += 1
    return paths
