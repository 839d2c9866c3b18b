"""HTTP client for ``tools serve`` daemons (core/server.py).

The wire protocol is dependency-free npz-over-HTTP; this client is the
symmetric convenience wrapper so Python callers get the SAME method
surface as a locally loaded artifact (``core.serving.ServingModel``):

    from acoustic_image_generation_tpu.core.client import ArtifactClient
    model = ArtifactClient("http://127.0.0.1:8321")
    gen, energy = model.generate(mfcc, video, seed=7)   # generation kind
    logits      = model.classify(frames)                # classification
    latents     = model.embed(acoustic, audio, video)   # embedding
    gen         = model.project(audio, video)           # projection/joint

Swapping a local ``load_artifact(dir)`` for ``ArtifactClient(url)`` (or
back) changes no call sites — deployment topology becomes a one-line
decision. Uses only ``urllib`` + ``numpy``.
"""

from __future__ import annotations

import io
import json
import urllib.request

import numpy as np


class ArtifactClient:
    """Remote handle to one served artifact. ``kind``/``manifest`` are
    fetched once at construction (which also validates the endpoint)."""

    def __init__(self, base_url: str, timeout: float = 300.0):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        with urllib.request.urlopen(
            f"{self.base_url}/manifest", timeout=timeout
        ) as r:
            self.manifest = json.load(r)

    @property
    def kind(self) -> str:
        return self.manifest.get("kind", "generation")

    def healthy(self) -> bool:
        try:
            with urllib.request.urlopen(
                f"{self.base_url}/healthz", timeout=self.timeout
            ) as r:
                return bool(json.load(r).get("ok"))
        except OSError:
            return False

    def _call(self, **arrays) -> dict:
        buf = io.BytesIO()
        np.savez(buf, **{k: v for k, v in arrays.items() if v is not None})
        req = urllib.request.Request(
            f"{self.base_url}/call", data=buf.getvalue(), method="POST"
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            with np.load(io.BytesIO(r.read())) as npz:
                return {k: npz[k] for k in npz.files}

    def generate(self, mfcc, video, seed: int = 0):
        out = self._call(
            mfcc=np.asarray(mfcc, np.float32),
            video=np.asarray(video, np.float32),
            seed=np.int32(seed),
        )
        if "energy" in out:
            return out["generated"], out["energy"]
        return out["generated"]

    def classify(self, inputs):
        return self._call(inputs=np.asarray(inputs, np.float32))["clip_logits"]

    def embed(self, acoustic, audio, video, seed: int = 0):
        out = self._call(
            acoustic=np.asarray(acoustic, np.float32),
            audio=np.asarray(audio, np.float32),
            video=np.asarray(video, np.float32),
            seed=np.int32(seed),
        )
        return {k[len("z_"):]: v for k, v in out.items()}

    def project(self, audio, video, seed: int = 0):
        return self._call(
            audio=np.asarray(audio, np.float32),
            video=np.asarray(video, np.float32),
            seed=np.int32(seed),
        )["generated"]
