"""Checkpoint warm-starts: per-modality initialization of a fresh state.

Port of the reference's init flags and their per-trainer restore logic:
``init_checkpoint`` (params-only, optimizer slots excluded —
``/root/reference/trainer/trainer.py:140-161``),
``visual/acoustic/audio_init_checkpoint`` (per-modality restores with scope
renaming, ``mfcctrainer.py:185-234``; ImageNet ResNet50 excluding
logits/conv_map, ``vision.py:20-42``).

Both checkpoint formats are accepted per path: our msgpack states and TF1
``.ckpt`` files (detected by the ``.index`` sibling / failure to msgpack-
decode), the latter through ``core.tf1_import``.
"""

from __future__ import annotations

import os

import flax.serialization
import jax

from acoustic_image_generation_tpu.core import tf1_import
from acoustic_image_generation_tpu.core.config import ExperimentConfig
from acoustic_image_generation_tpu.train.state import TrainState

# model-key -> TF scope per modality (the reference's scope names); one
# map shared with the exporter so both directions stay in sync
from acoustic_image_generation_tpu.core.tf1_export import SCOPES as _SCOPES


def _is_tf_checkpoint(path: str) -> bool:
    return os.path.exists(path + ".index")


def _load_our_params(path: str):
    with open(path, "rb") as f:
        data = f.read()
    return flax.serialization.msgpack_restore(data)


def overlay_model(state: TrainState, model_key: str, path: str) -> TrainState:
    """Replace ``state.params[model_key]`` (and its batch stats, if any)
    from a checkpoint of either format."""
    params = jax.device_get(state.params)
    stats = jax.device_get(state.batch_stats)
    if _is_tf_checkpoint(path):
        ckpt = tf1_import.load_tf1_checkpoint(path)
        scope = _SCOPES.get(model_key, model_key)
        imported_p, imported_s = tf1_import.import_scope(ckpt, scope)
        if model_key == "resnet":  # ImageNet init skips the new heads
            for head in ("logits", "conv_map"):
                imported_p.pop(head, None)
                imported_s.pop(head, None)
        params[model_key] = tf1_import.merge_into(params[model_key], imported_p)
        if model_key in stats and imported_s:
            stats[model_key] = tf1_import.merge_into(stats[model_key], imported_s)
    else:
        restored = _load_our_params(path)
        src_params = restored.get("params", restored)
        sub = src_params[model_key] if model_key in src_params else src_params
        params[model_key] = flax.serialization.from_state_dict(params[model_key], sub)
        src_stats = restored.get("batch_stats", {})
        if model_key in stats and model_key in src_stats:
            stats[model_key] = flax.serialization.from_state_dict(
                stats[model_key], src_stats[model_key]
            )
    return state.replace(params=params, batch_stats=stats)


def restore_params_only(state: TrainState, path: str) -> TrainState:
    """Full params-only restore (Adam slots deliberately excluded,
    ``trainer.py:140-161``)."""
    with open(path, "rb") as f:
        restored = flax.serialization.msgpack_restore(f.read())
    params = flax.serialization.from_state_dict(jax.device_get(state.params), restored["params"])
    stats = flax.serialization.from_state_dict(
        jax.device_get(state.batch_stats), restored["batch_stats"]
    )
    return state.replace(params=params, batch_stats=stats)


def apply_init_checkpoints(state: TrainState, config: ExperimentConfig) -> TrainState:
    """Wire the reference's four init flags onto a fresh state."""
    run = config.run
    if run.init_checkpoint:
        state = restore_params_only(state, run.init_checkpoint)
    pairs = [
        (run.visual_init_checkpoint, ("resnet", "video")),
        (run.acoustic_init_checkpoint, ("generator", "acoustic")),
        (run.audio_init_checkpoint, ("audio",)),
    ]
    params_keys = set(jax.device_get(jax.tree_util.tree_map(lambda x: 0, state.params)).keys())
    for path, candidates in pairs:
        if not path:
            continue
        for key in candidates:
            if key in params_keys:
                state = overlay_model(state, key, path)
                break
        else:
            raise KeyError(
                f"no model key {candidates} in state for checkpoint {path}"
            )
    return state
