"""Full PARQ model: backbone → rayPE → tokenize → recurrent decoder.

Functional mirror of the reference's LightningModule forward
(ref: model/parq_lightning.py:68-95), returning the per-iteration stacked
box-prediction dict.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..geometry import Camera, Pose
from .box_processor import load_mean_size_table
from .decoder import PARQDecoder
from .ray_pe import AddRayPE
from .resnet_fpn import ResNetFPN


class PARQModel(nn.Module):
    """Configured from the cfg tree (same keys as the reference YAMLs)."""
    resnet_name: str = "resnet50"
    backbone_layer: int = 0
    backbone_freeze: bool = False
    fpn_channels: int = 256
    tokenizer_out_channels: int = 1024
    ray_points_scale: Tuple[float, ...] = (-3.0, 3.0, -2.0, 0.5, 0.25, 5.25)
    num_samples: int = 64
    min_depth: float = 0.25
    max_depth: float = 5.25
    dec_dim: int = 1024
    dec_heads: int = 4
    dec_ffn_dim: int = 768
    dec_layers: int = 8
    dropout_rate: float = 0.1
    num_queries: int = 256
    num_semcls: int = 9
    scale: Tuple[float, ...] = (-3.0, 3.0, -2.0, 0.5, 0.25, 5.25)
    share_weights: bool = True
    image_size: Tuple[int, int] = (320, 240)  # (W, H)
    mean_size: Tuple[Tuple[float, ...], ...] = ()
    use_pallas: bool = True  # fused matmul sampler (bf16 TPU path only)
    use_flash: bool = True   # fused cross-attn kernel (bf16 TPU path only)
    batched_grad: bool = True  # fold iterations for the training backward
    remat: bool = False
    # sequence parallelism: shard the memory tokens + K/V over this mesh's
    # `model` axis (parallel/seq_parallel.py); flash path only
    sp_mesh: Any = None
    compute_dtype: str = "float32"   # "bfloat16" for the fast path

    @classmethod
    def from_config(cls, cfg, use_pallas: bool = None,
                    sp_mesh=None) -> "PARQModel":
        m = cfg.MODEL
        class2type = None
        if str(cfg.DATAMODULE.DATASET).lower() == "arkitscenes":
            from ..data.arkitscenes import ARKIT_CLASSES
            class2type = dict(enumerate(ARKIT_CLASSES))
        mean = load_mean_size_table(m.DECODER.MEAN_SIZE_PATH,
                                    m.DECODER.NUM_SEMCLS,
                                    class2type=class2type)
        if use_pallas is None:
            use_pallas = bool(cfg.TPU.USE_PALLAS_SAMPLER)
        compute_dtype = str(cfg.TPU.COMPUTE_DTYPE)
        return cls(
            resnet_name=m.BACKBONE2D.RESNET_NAME,
            backbone_layer=int(m.BACKBONE2D.LAYER),
            backbone_freeze=bool(m.BACKBONE2D.FREEZE),
            fpn_channels=int(cfg.TPU.FPN_CHANNELS),
            tokenizer_out_channels=m.TOKENIZER.OUT_CHANNELS,
            ray_points_scale=tuple(m.TOKENIZER.RAY_POINTS_SCALE),
            num_samples=m.TOKENIZER.NUM_SAMPLES,
            min_depth=m.TOKENIZER.MIN_DEPTH,
            max_depth=m.TOKENIZER.MAX_DEPTH,
            dec_dim=m.DECODER.TRANSFORMER.DEC_DIM,
            dec_heads=m.DECODER.TRANSFORMER.DEC_HEADS,
            dec_ffn_dim=m.DECODER.TRANSFORMER.DEC_FFN_DIM,
            dec_layers=m.DECODER.TRANSFORMER.DEC_LAYERS,
            dropout_rate=m.DECODER.TRANSFORMER.DROPOUT_RATE,
            num_queries=m.DECODER.NUM_QUERIES,
            num_semcls=m.DECODER.NUM_SEMCLS,
            scale=tuple(m.DECODER.TRANSFORMER.SCALE),
            share_weights=bool(m.DECODER.TRANSFORMER.SHARE_WEIGHTS),
            image_size=tuple(cfg.TPU.IMAGE_SIZE),
            mean_size=tuple(tuple(float(v) for v in row) for row in mean),
            use_pallas=use_pallas,
            use_flash=bool(getattr(cfg.TPU, "USE_FLASH_CROSS_ATTN", True)),
            batched_grad=bool(getattr(cfg.TPU, "BATCHED_GRAD", True)),
            remat=bool(cfg.TPU.REMAT),
            sp_mesh=sp_mesh,
            compute_dtype=compute_dtype,
        )

    @property
    def feat_size(self) -> Tuple[int, int]:
        s = 2 ** (self.backbone_layer + 2)
        return (self.image_size[0] // s, self.image_size[1] // s)

    @nn.compact
    def __call__(self, batch: Dict[str, Any], *,
                 deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        """batch keys (all jnp): rgb_img (B,T,H,W,3) in [0,1], camera (B,T,6),
        T_camera_pseudoCam (B,T,12), T_world_pseudoCam (B,T,12),
        T_world_local (B,1,12)."""
        camera = Camera(batch["camera"])
        T_camera_pseudoCam = Pose(batch["T_camera_pseudoCam"])
        T_world_pseudoCam = Pose(batch["T_world_pseudoCam"])
        T_world_local = Pose(batch["T_world_local"])

        dtype = (jnp.bfloat16 if self.compute_dtype == "bfloat16"
                 else jnp.float32)
        backbone = ResNetFPN(self.resnet_name, self.backbone_layer,
                             self.backbone_freeze, self.fpn_channels,
                             dtype=dtype, name="backbone2d")

        scale_factor = 1.0 / (2 ** (self.backbone_layer + 2))
        camera_feature = camera.scale(scale_factor)  # ref: resnet_fpn.py:88-90

        encoding = AddRayPE(
            self.tokenizer_out_channels, tuple(self.ray_points_scale),
            self.num_samples, self.min_depth, self.max_depth,
            self.feat_size, dtype=dtype, name="add_ray_pe")(
            camera_feature, T_camera_pseudoCam, T_world_pseudoCam,
            T_world_local)

        feats = backbone(batch["rgb_img"])  # (B,T,h,w,4*fpn_channels)
        memory = feats + encoding  # (B,T,h,w,C); tokenization = reshape
        # exposed for TB feature-map logging (ref logs PCA-compressed maps,
        # parq_lightning.py:252-276); recorded only when the caller asks for
        # mutable=["intermediates"], free otherwise
        self.sow("intermediates", "feature_map", memory)

        outputs = PARQDecoder(
            dim=self.dec_dim, heads=self.dec_heads, ffn_dim=self.dec_ffn_dim,
            num_layers=self.dec_layers, dropout_rate=self.dropout_rate,
            num_queries=self.num_queries, num_semcls=self.num_semcls,
            scale=tuple(self.scale), feat_size=self.feat_size,
            mean_size=self.mean_size, share_weights=self.share_weights,
            use_pallas=self.use_pallas, use_flash=self.use_flash,
            batched_grad=self.batched_grad, remat=self.remat,
            sp_mesh=self.sp_mesh, dtype=dtype,
            name="box3d_decoder")(
            memory, camera_feature, T_camera_pseudoCam, T_world_pseudoCam,
            T_world_local, deterministic=deterministic)
        return outputs
