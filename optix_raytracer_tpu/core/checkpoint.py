"""Checkpoint / resume of progressive render state.

SURVEY.md §5 checkpoint/resume (a): the reference's resumable state is the
accumulation buffer + subframe counter (`whitted.h:92-94`, reset at
`optixPathTracer.cpp:480-481`), exported via saveImage. Here the Film pytree
(+ camera + user config) round-trips through one .npz, so a progressive
render can stop, restart and continue to exactly the state a straight run
reaches (tested). The compile-cache half of checkpointing — the OptiX disk
cache (`optix_host.h:136-228`) — is the XLA persistent compilation cache,
managed by api.DeviceContext.
"""
from __future__ import annotations

import dataclasses
import json

import jax.numpy as jnp
import numpy as np

from . import film as film_mod
from .camera import Camera

FORMAT_VERSION = 1


def save_checkpoint(path: str, film: film_mod.Film, camera: Camera = None,
                    config: dict = None):
    camera_json = (json.dumps(dataclasses.asdict(camera))
                   if camera is not None else "")
    extra = {}
    if film.sq is not None:
        extra["sq"] = np.asarray(film.sq)
        extra["launches"] = np.asarray(film.launches)
    np.savez_compressed(
        path,
        version=FORMAT_VERSION,
        accum=np.asarray(film.accum),
        subframe=np.asarray(film.subframe),
        camera_json=camera_json,
        config_json=json.dumps(config or {}),
        **extra,
    )


def load_checkpoint(path: str):
    """Returns (Film, Camera or None, config dict)."""
    with np.load(path, allow_pickle=False) as z:
        assert int(z["version"]) == FORMAT_VERSION
        film = film_mod.Film(
            accum=jnp.asarray(z["accum"]),
            subframe=jnp.asarray(z["subframe"]),
            sq=jnp.asarray(z["sq"]) if "sq" in z.files else None,
            launches=(jnp.asarray(z["launches"]) if "launches" in z.files
                      else None))
        cam_js = str(z["camera_json"])
        camera = None
        if cam_js:
            d = json.loads(cam_js)
            d = {k: tuple(v) if isinstance(v, list) else v
                 for k, v in d.items()}
            camera = Camera(**d)
        config = json.loads(str(z["config_json"]))
    return film, camera, config


# ---------------------------------------------------------------------------
# Orbax backend — atomic directory checkpoints that preserve shardings, so a
# multichip progressive render (film sharded over the rows x samples mesh)
# can checkpoint/restore without gathering to one host. npz remains the
# lightweight single-file default.
# ---------------------------------------------------------------------------

def save_checkpoint_orbax(path: str, film: film_mod.Film,
                          camera: Camera = None, config: dict = None):
    """Save to an orbax checkpoint directory (created/overwritten)."""
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    meta = {
        "version": FORMAT_VERSION,
        "camera": dataclasses.asdict(camera) if camera is not None else None,
        "config": config or {},
    }
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, {"accum": film.accum, "subframe": film.subframe},
                   force=True)
    with open(os.path.join(path, "render_meta.json"), "w") as f:
        json.dump(meta, f)


def load_checkpoint_orbax(path: str, abstract_film: film_mod.Film = None):
    """Restore (Film, Camera or None, config) from an orbax directory.

    abstract_film: optional Film of jax.ShapeDtypeStructs (with shardings)
    to restore distributed state directly onto a mesh.
    """
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    target = None
    if abstract_film is not None:
        target = {"accum": abstract_film.accum,
                  "subframe": abstract_film.subframe}
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(path, target)
    with open(os.path.join(path, "render_meta.json")) as f:
        meta = json.load(f)
    assert int(meta["version"]) == FORMAT_VERSION
    camera = None
    if meta["camera"] is not None:
        d = {k: tuple(v) if isinstance(v, list) else v
             for k, v in meta["camera"].items()}
        camera = Camera(**d)
    film = film_mod.Film(accum=jnp.asarray(state["accum"]),
                         subframe=jnp.asarray(state["subframe"]))
    return film, camera, meta["config"]
