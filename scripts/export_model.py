#!/usr/bin/env python
"""Export the jitted eval forward as a serialized StableHLO artifact.

The TPU-native deployment story the reference (torch, no export path)
lacks: `jax.export` serializes the lowered forward — params baked in as
constants or passed as inputs — into a bytes artifact a serving binary
reloads with `jax.export.deserialize` and calls without Python model code.

    python scripts/export_model.py --cfg configs/eval.yaml \
        --out parq_fwd.jaxexport [--batch 1]

The artifact is platform-specific (lowered for the exporting machine's
default backend); export on the target platform class (TPU for serving,
CPU for tests). Params are passed as an input pytree so one artifact
serves any checkpoint with the same structure — the artifact embeds NO
weights (there is deliberately no --CHECKPOINT_PATH flag: a checkpoint
cannot change the exported bytes; pair the artifact with a checkpoint at
serving time, e.g. `scripts/serve.py --artifact ... --CHECKPOINT_PATH ...`).
"""
import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def export_forward(cfg, batch_size: int = 1, checkpoint: str = None):
    """Returns (serialized_bytes, params, example_batch)."""
    import jax
    from jax import export as jexport

    from parq_tpu.data.synthetic import device_batch, make_batch
    from parq_tpu.models import PARQModel

    model = PARQModel.from_config(cfg)
    batch = device_batch(make_batch(list(range(batch_size)),
                                    image_size=tuple(cfg.TPU.IMAGE_SIZE)))
    # the forward consumes only the model inputs — strip labels etc.
    keys = ("rgb_img", "camera", "T_camera_pseudoCam",
            "T_world_pseudoCam", "T_world_local")
    batch = {k: batch[k] for k in keys}
    variables = model.init(jax.random.PRNGKey(0), batch)
    if checkpoint:
        from parq_tpu.train import load_pretrained
        from parq_tpu.train.train_step import TrainState
        import optax
        state = TrainState(step=0, params=variables["params"],
                           frozen=variables.get("frozen", {}),
                           opt_state=None, tx=optax.identity(),
                           apply_fn=model.apply)
        state = load_pretrained(
            state, checkpoint,
            num_heads=cfg.MODEL.DECODER.TRANSFORMER.DEC_HEADS,
            share_weights=cfg.MODEL.DECODER.TRANSFORMER.SHARE_WEIGHTS,
            strict=True)
        variables = {"params": state.params, "frozen": state.frozen}

    def fwd(variables, batch):
        return model.apply(variables, batch, deterministic=True)

    exported = jexport.export(jax.jit(fwd))(variables, batch)
    return exported.serialize(), variables, batch


def main():
    ap = argparse.ArgumentParser(description="Export PARQ-TPU forward")
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("opts", nargs=argparse.REMAINDER)
    args = ap.parse_args()

    from parq_tpu.config import apply_platform, get_cfg, update_config
    cfg = get_cfg()
    update_config(cfg, args)
    logging.basicConfig(level=logging.INFO)
    apply_platform(cfg)

    blob, _, _ = export_forward(cfg, args.batch)
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"exported {len(blob)} bytes -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
