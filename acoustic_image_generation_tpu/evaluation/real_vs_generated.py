"""Real-vs-generated DualCamNet accuracy in one pass
(``/root/reference/saveimagesresnet.py:30-120``): a trained DualCamNet
classifies (a) the real acoustic image and (b) the generator's output for
the same clips; both accuracies come from one jitted step. The reference
builds two DualCamNet instances in one graph; functionally identical."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from acoustic_image_generation_tpu.data import preprocess
from acoustic_image_generation_tpu.models.dualcamnet import clip_logits


def real_vs_generated_accuracy(
    generation_task,
    generation_state,
    classify_task,
    classifier_params,
    loader,
    *,
    seed: int = 0,
) -> dict:
    """Returns {"real_accuracy", "generated_accuracy", "n"}. ``classify_task``
    supplies the DualCamNet module; ``generation_task`` the frozen
    generator."""
    model = classify_task.model
    nf = classify_task.num_frames
    num_classes = classify_task.cfg.data.num_classes

    @jax.jit
    def step(raw, key):
        f = raw["acoustic"].shape[1]
        flat = lambda x: x.reshape(-1, *x.shape[2:])
        batch = preprocess.preprocess_batch(
            flat(raw["acoustic"]), flat(raw["audio"]), flat(raw["video"]),
            jnp.repeat(raw["action"], f), jnp.repeat(raw["location"], f),
        )
        out, _ = generation_task._forward(
            generation_state.params, generation_state.batch_stats, batch,
            {"latent": key}, train=False,
        )
        labels = jax.nn.one_hot(batch.action[::nf], num_classes)

        def correct(images):
            frame_logits = model.apply({"params": classifier_params}, images)
            logits = clip_logits(frame_logits.astype(jnp.float32), nf)
            return (jnp.argmax(logits, 1) == jnp.argmax(labels, 1)).astype(jnp.float32)

        return correct(batch.acoustic), correct(out.output.astype(jnp.float32))

    real_sum = gen_sum = count = 0.0
    for i, raw_batch in enumerate(loader.batches(0)):
        raw = {
            "acoustic": raw_batch.acoustic,
            "audio": raw_batch.audio,
            "video": raw_batch.video,
            "action": raw_batch.action,
            "location": raw_batch.location,
        }
        key = jax.random.fold_in(jax.random.key(seed), i)
        real_c, gen_c = jax.device_get(step(raw, key))
        v = raw_batch.valid
        real_sum += float(np.sum(real_c[:v]))
        gen_sum += float(np.sum(gen_c[:v]))
        count += v
    return {
        "real_accuracy": real_sum / max(count, 1),
        "generated_accuracy": gen_sum / max(count, 1),
        "n": int(count),
    }
