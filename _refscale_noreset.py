import sys
sys.argv = ["x", "--epochs", "10"]
import json, tempfile, time
import numpy as np
from contrastive_lift_tpu.config import Config
from contrastive_lift_tpu.data.synthetic import make_synthetic_scene
from contrastive_lift_tpu.train.loop import Trainer

scene = make_synthetic_scene(num_spheres=5, num_train=24, num_val=4,
                             image_dim=(48, 64), num_thing_classes=1, seed=7)
cfg = Config(
    instance_loss_mode="slow_fast", use_DINO_style=True, max_instances=3,
    use_mlp_for_semantics=True, use_mlp_for_instances=True,
    pe_sem=0, pe_ins=0, semantic_weight_mode="softmax",
    probabilistic_ce_mode="NoTTAConf",
    batch_size=2048, chunk=4096, min_grid_dim=64, max_grid_dim=128,
    grid_upscale_epochs=[1, 2], bbox_aabb_reset_epochs=[],
    max_rays_instances=1024, max_labels_per_image=16,
    batch_size_segments=16, max_rays_segments=512, chunk_segment=2048,
    late_semantic_optimization=0, instance_optimization_epoch=3,
    segment_optimization_epoch=6, max_epoch=10,
    image_dim=(48, 64), seed=0, lr=1.5e-3, decay_step=[8, 9],
    save_every_n_train_steps=0, precision="fp32",
    weight_class_0=1.0, lambda_semantics=1.0, lambda_dist_reg=0.0,
).resolve_epochs()
with tempfile.TemporaryDirectory() as tmp:
    trainer = Trainer(cfg, scene, tmp, log_every=1000)
    for epoch in range(cfg.max_epoch):
        trainer.train_epoch(epoch)
        val = trainer.validate(epoch)
        print(json.dumps({"epoch": epoch, "grid": trainer.grid_dim[0],
                          **{k: round(float(v), 4) for k, v in val.items()}}),
              flush=True)

# post-train: raw semantic confusion on VALID pixels of one val frame
import jax as _jax
from contrastive_lift_tpu.inference.render import render_frames as _rf
frame = scene.val_frames[0]
per = _rf(trainer.state.params, trainer.mcfg, trainer.rcfg, trainer.state_r,
          [frame], chunk=4096)
sem_pred = per[0]["semantics"].argmax(-1)
m = frame.mask
import numpy as _np
print("valid-pixel confusion [gt0,gt1] x [pred0,pred1]:",
      [[int(_np.sum((frame.gt_semantics[m] == g) & (sem_pred[m] == p)))
        for p in (0, 1)] for g in (0, 1)], flush=True)
