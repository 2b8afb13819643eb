"""Convert a reference PyTorch checkpoint (.pth.tar) into this framework's
Orbax checkpoint, so reference users can switch and resume/eval here.

The reference saves ``torch.save({'encoder': sd, 'predictor': sd,
'target_encoder': sd, 'opt': ..., 'epoch': E, ...})`` every epoch
(reference: app/avjepa/train.py:332-350). This tool maps the three model
state dicts into our param pytrees (avjepa_tpu/utils/torch_import.py),
wraps them in a fresh JepaState at step = epoch * ipe (schedules here are
pure functions of the step, so resume continues the reference's LR/WD/EMA
trajectory), and writes ``<folder>/<tag>-ckpt/<step>`` — the exact layout
``meta.load_checkpoint: true`` resumes from.

Optimizer moments are NOT converted (torch Adam state is keyed by parameter
order and its exact moments matter little after a few hundred steps); they
start at zero, which the reference's own fine-tuning flows also do.

Usage:
  python tools/convert_reference_checkpoint.py <ref.pth.tar> <config.yaml>
      [--out-folder FOLDER] [--tag TAG]

The YAML is the pretrain config the checkpoint was trained with (model
sizes must match). --out-folder/--tag default to the config's logging
section.

The reverse direction (leave this framework, or hand a checkpoint back to
torch tooling) is ``--export``:

  python tools/convert_reference_checkpoint.py --export <orbax-ckpt-dir> \
      <out.pth.tar> [--ipe N]

which writes the reference's exact epoch-checkpoint dict
(encoder/predictor/target_encoder state dicts + epoch, reference
app/avjepa/train.py:332-350) from the latest Orbax step, via the inverse
key mapping in avjepa_tpu/utils/torch_import.py.
"""

from __future__ import annotations

import argparse
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np


def tensors_to_numpy(sd: dict) -> dict:
    out = {}
    for k, v in sd.items():
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def convert(ckpt_path: str, config_path: str, out_folder: str | None,
            tag: str | None) -> str:
    import torch

    import jax
    from avjepa_tpu.config import load_config
    from avjepa_tpu.train import pretrain
    from avjepa_tpu.utils.checkpoint import CheckpointManager
    from avjepa_tpu.utils.torch_import import (
        encoder_params_from_state_dict,
        predictor_params_from_state_dict,
    )

    cfg = load_config(config_path)
    ref = torch.load(ckpt_path, map_location="cpu", weights_only=False)

    enc_sd = tensors_to_numpy(ref["encoder"])
    pred_sd = tensors_to_numpy(ref["predictor"])
    tgt_sd = tensors_to_numpy(ref.get("target_encoder", ref["encoder"]))
    epoch = int(ref.get("epoch", 0))

    handles = pretrain.setup(cfg)
    state = jax.device_get(handles.state)

    def merge(init_tree, conv_tree, name):
        """Converted arrays replace the initialized ones; anything the
        reference lacks (it cannot happen for matching configs) stays."""
        out = dict(init_tree)
        for k, v in conv_tree.items():
            if k not in out:
                raise KeyError(f"{name}: unexpected param group '{k}'")
            if isinstance(v, dict):
                out[k] = merge(out[k], v, f"{name}.{k}")
            else:
                have = np.asarray(out[k])
                got = np.asarray(v).astype(have.dtype)
                if (
                    k.startswith("mask_tokens")
                    and got.ndim == have.ndim == 2
                    and got.shape[0] < have.shape[0]
                    and got.shape[1] == have.shape[1]
                ):
                    # this framework allocates max(2, len(mask)) mask tokens
                    # (train/pretrain.py); a reference checkpoint trained with
                    # fewer keeps its rows, the rest stay at their init
                    out[k] = np.concatenate([got, have[got.shape[0]:]])
                    continue
                if have.shape != got.shape:
                    raise ValueError(
                        f"{name}.{k}: shape {got.shape} != expected {have.shape}"
                        " — does the YAML match the checkpoint's model?"
                    )
                out[k] = got
        return out

    enc = merge(state.enc_params, encoder_params_from_state_dict(enc_sd), "encoder")
    tgt = merge(
        state.target_params, encoder_params_from_state_dict(tgt_sd), "target"
    )
    pred = merge(
        state.pred_params, predictor_params_from_state_dict(pred_sd), "predictor"
    )

    step = epoch * cfg.optimization.ipe
    state = state.replace(
        step=np.asarray(step, np.int32),
        enc_params=enc,
        target_params=tgt,
        pred_params=pred,
    )

    folder = out_folder or cfg.logging.folder
    tag = tag or cfg.logging.write_tag
    ckpt_dir = os.path.join(folder, f"{tag}-ckpt")
    mngr = CheckpointManager(ckpt_dir)
    mngr.save(step, state, force=True)
    mngr.close()
    print(f"wrote step {step} (epoch {epoch}) to {ckpt_dir}")
    return ckpt_dir


def export(ckpt_dir: str, out_path: str, ipe: int = 1) -> str:
    """Latest Orbax step -> reference-format ``.pth.tar``.

    Restores through an abstract ShapeDtypeStruct template (never two full
    states alive), maps the three param pytrees back to reference state-dict
    keys, and saves the dict layout the reference writes each epoch
    (app/avjepa/train.py:332-350) so reference eval/resume tooling reads it.
    """
    import torch

    import jax
    from avjepa_tpu.utils.checkpoint import CheckpointManager
    from avjepa_tpu.utils.torch_import import (
        encoder_params_to_state_dict,
        predictor_params_to_state_dict,
    )

    mngr = CheckpointManager(ckpt_dir)
    step = mngr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint step under {ckpt_dir!r}")
    meta = mngr.mngr.item_metadata(step)
    template = jax.tree_util.tree_map(
        lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype), meta
    )
    state = mngr.restore(template, step)
    mngr.close()

    def to_torch(sd: dict) -> dict:
        return {k: torch.from_numpy(np.ascontiguousarray(np.asarray(v)))
                for k, v in sd.items()}

    out = {
        "encoder": to_torch(encoder_params_to_state_dict(state["enc_params"])),
        "predictor": to_torch(
            predictor_params_to_state_dict(state["pred_params"])
        ),
        "target_encoder": to_torch(
            encoder_params_to_state_dict(state["target_params"])
        ),
        "epoch": int(np.asarray(state["step"])) // max(1, ipe),
        "loss": 0.0,
        "batch_size": 0,
        "world_size": 1,
        "lr": 0.0,
    }
    torch.save(out, out_path)
    print(f"exported step {int(np.asarray(state['step']))} -> {out_path}")
    return out_path


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("checkpoint", help="reference .pth.tar (or, with "
                    "--export, an Orbax checkpoint dir)")
    ap.add_argument("config", help="matching pretrain YAML (or, with "
                    "--export, the output .pth.tar path)")
    ap.add_argument("--out-folder", default=None)
    ap.add_argument("--tag", default=None)
    ap.add_argument("--export", action="store_true",
                    help="reverse direction: Orbax ckpt dir -> .pth.tar")
    ap.add_argument("--ipe", type=int, default=1,
                    help="--export: iterations/epoch for the epoch field")
    args = ap.parse_args(argv)
    if args.export:
        export(args.checkpoint, args.config, args.ipe)
    else:
        convert(args.checkpoint, args.config, args.out_folder, args.tag)


if __name__ == "__main__":
    main()
