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


# --- LSTM stop-predictor interop ---------------------------------------------
#
# The reference persists its LSTM stop predictors as raw state_dicts under
# model/lstm_threshold_predictor.pth (PPOV2.0/train_lstm.py:98) and
# model/best_peak_and_stop.pth (PPOV2.1/train_lstm.py:122-124).  torch packs
# each nn.LSTM layer as (weight_ih_l{k} [4H, in], weight_hh_l{k} [4H, H],
# bias_ih_l{k}, bias_hh_l{k}) with gate chunk order (i, f, g, o); flax's
# OptimizedLSTMCell keeps per-gate denses i{g}/h{g} with a single bias on the
# hidden-side dense.  Export puts the flax bias into bias_hh (bias_ih = 0);
# import sums both torch biases — numerically exact both ways.

_GATES = ("i", "f", "g", "o")


def _cell_to_torch_lstm(cell: dict, layer: int, sd: dict) -> None:
    import torch

    w_ih = np.concatenate(
        [np.asarray(cell[f"i{g}"]["kernel"]).T for g in _GATES], axis=0
    )
    w_hh = np.concatenate(
        [np.asarray(cell[f"h{g}"]["kernel"]).T for g in _GATES], axis=0
    )
    b_hh = np.concatenate([np.asarray(cell[f"h{g}"]["bias"]) for g in _GATES])
    sd[f"lstm.weight_ih_l{layer}"] = torch.from_numpy(w_ih.copy())
    sd[f"lstm.weight_hh_l{layer}"] = torch.from_numpy(w_hh.copy())
    sd[f"lstm.bias_ih_l{layer}"] = torch.from_numpy(np.zeros_like(b_hh))
    sd[f"lstm.bias_hh_l{layer}"] = torch.from_numpy(b_hh.copy())


def _cell_from_torch_lstm(sd: dict, layer: int) -> dict:
    w_ih = np.asarray(sd[f"lstm.weight_ih_l{layer}"])
    w_hh = np.asarray(sd[f"lstm.weight_hh_l{layer}"])
    b = np.asarray(sd[f"lstm.bias_ih_l{layer}"]) + np.asarray(
        sd[f"lstm.bias_hh_l{layer}"]
    )
    hidden = w_hh.shape[1]
    cell: dict = {}
    for k, g in enumerate(_GATES):
        sl = slice(k * hidden, (k + 1) * hidden)
        cell[f"i{g}"] = {"kernel": np.ascontiguousarray(w_ih[sl].T)}
        cell[f"h{g}"] = {
            "kernel": np.ascontiguousarray(w_hh[sl].T),
            "bias": b[sl].copy(),
        }
    return cell


def _dense_to_torch(mod: dict, torch_name: str, sd: dict) -> None:
    import torch

    sd[f"{torch_name}.weight"] = torch.from_numpy(
        np.asarray(mod["kernel"]).T.copy()
    )
    sd[f"{torch_name}.bias"] = torch.from_numpy(np.asarray(mod["bias"]).copy())


def export_threshold_lstm_pth(params: dict, path: str) -> None:
    """``ConcentrationThresholdPredictor`` -> the reference's
    ``lstm_threshold_predictor.pth`` layout (lstm.* 3 layers + fc Sequential
    Linear/LayerNorm/Linear at indices 0/1/4, PPOV2.0/model.py:203-224)."""
    import torch

    p = params["params"] if "params" in params else params
    sd: dict = {}
    cells = sorted(k for k in p if k.startswith("OptimizedLSTMCell_"))
    for i, k in enumerate(cells):
        _cell_to_torch_lstm(p[k], i, sd)
    _dense_to_torch(p["Dense_0"], "fc.0", sd)
    sd["fc.1.weight"] = torch.from_numpy(np.asarray(p["LayerNorm_0"]["scale"]).copy())
    sd["fc.1.bias"] = torch.from_numpy(np.asarray(p["LayerNorm_0"]["bias"]).copy())
    _dense_to_torch(p["Dense_1"], "fc.4", sd)
    torch.save(sd, path)


def import_threshold_lstm_pth(path: str) -> dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    n = sum(1 for k in sd if k.startswith("lstm.weight_ih_l"))
    p: dict = {f"OptimizedLSTMCell_{i}": _cell_from_torch_lstm(sd, i)
               for i in range(n)}
    p["Dense_0"] = {"kernel": np.asarray(sd["fc.0.weight"]).T.copy(),
                    "bias": np.asarray(sd["fc.0.bias"])}
    p["LayerNorm_0"] = {"scale": np.asarray(sd["fc.1.weight"]),
                        "bias": np.asarray(sd["fc.1.bias"])}
    p["Dense_1"] = {"kernel": np.asarray(sd["fc.4.weight"]).T.copy(),
                    "bias": np.asarray(sd["fc.4.bias"])}
    return {"params": p}


def export_peak_stop_pth(params: dict, path: str) -> None:
    """``PeakAndStopPredictor`` -> the reference's ``best_peak_and_stop.pth``
    layout (1-layer lstm.*, fc_peak Linear, fc_stop Sequential(Linear,
    Sigmoid) at index 0, PPOV2.1/train_lstm.py:84-100)."""
    import torch

    p = params["params"] if "params" in params else params
    sd: dict = {}
    _cell_to_torch_lstm(p["OptimizedLSTMCell_0"], 0, sd)
    _dense_to_torch(p["fc_peak"], "fc_peak", sd)
    _dense_to_torch(p["fc_stop"], "fc_stop.0", sd)
    torch.save(sd, path)


def import_peak_stop_pth(path: str) -> dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {"params": {
        "OptimizedLSTMCell_0": _cell_from_torch_lstm(sd, 0),
        "fc_peak": {"kernel": np.asarray(sd["fc_peak.weight"]).T.copy(),
                    "bias": np.asarray(sd["fc_peak.bias"])},
        "fc_stop": {"kernel": np.asarray(sd["fc_stop.0.weight"]).T.copy(),
                    "bias": np.asarray(sd["fc_stop.0.bias"])},
    }}


def export_discriminator_pth(params: dict, path: str) -> None:
    import torch

    torch.save(_flax_to_state_dict(params, _DISC_MAP), path)


def import_discriminator_pth(path: str) -> dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return _state_dict_to_flax(sd, _DISC_MAP)
