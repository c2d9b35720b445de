"""Torch ``.pth`` interop for the reference's checkpoint artifact names.

The reference persists policies as torch ``state_dict``s
(``model/ppo_successful_models.pth``, PPOV2.0/train_ppo2.0.py:256) with the
module layout of ``PPOActorCritic`` (PPOV1.1/model.py:17-53):

    feature.0  Linear(6, 256)     feature.1  LayerNorm(256)
    feature.3  Linear(256, 128)   feature.4  LayerNorm(128)
    actor      Linear(128, 5)     critic     Linear(128, 1)

These functions convert between that format and the flax ``ActorCritic``
parameter tree (Dense kernels are transposed; LayerNorm scale<->weight), so
checkpoints trained here load into the reference code and vice versa.
"""

from __future__ import annotations

import numpy as np

_AC_MAP = [
    # (torch prefix, flax module, is_layernorm)
    ("feature.0", "Dense_0", False),
    ("feature.1", "LayerNorm_0", True),
    ("feature.3", "Dense_1", False),
    ("feature.4", "LayerNorm_1", True),
    ("actor", "Dense_2", False),
    ("critic", "Dense_3", False),
]

_DISC_MAP = [
    ("net.0", "Dense_0", False),
    ("net.2", "Dense_1", False),
]


def _flax_to_state_dict(params: dict, mapping) -> dict:
    import torch

    p = params["params"] if "params" in params else params
    sd = {}
    for torch_name, flax_name, is_ln in mapping:
        mod = p[flax_name]
        if is_ln:
            sd[f"{torch_name}.weight"] = torch.from_numpy(np.asarray(mod["scale"]).copy())
            sd[f"{torch_name}.bias"] = torch.from_numpy(np.asarray(mod["bias"]).copy())
        else:
            sd[f"{torch_name}.weight"] = torch.from_numpy(np.asarray(mod["kernel"]).T.copy())
            sd[f"{torch_name}.bias"] = torch.from_numpy(np.asarray(mod["bias"]).copy())
    return sd


def _state_dict_to_flax(sd: dict, mapping) -> dict:
    p = {}
    for torch_name, flax_name, is_ln in mapping:
        w = np.asarray(sd[f"{torch_name}.weight"])
        b = np.asarray(sd[f"{torch_name}.bias"])
        if is_ln:
            p[flax_name] = {"scale": w, "bias": b}
        else:
            p[flax_name] = {"kernel": w.T.copy(), "bias": b}
    return {"params": p}


def export_actor_critic_pth(params: dict, path: str) -> None:
    import torch

    torch.save(_flax_to_state_dict(params, _AC_MAP), path)


def import_actor_critic_pth(path: str) -> dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return _state_dict_to_flax(sd, _AC_MAP)


def export_discriminator_pth(params: dict, path: str) -> None:
    import torch

    torch.save(_flax_to_state_dict(params, _DISC_MAP), path)


def import_discriminator_pth(path: str) -> dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return _state_dict_to_flax(sd, _DISC_MAP)
