"""Same-host baseline: time the REFERENCE torch render path on this CPU.

Anchors bench.py's A100_BASELINE_RAYS_PER_SEC (see BASELINE.md "Pinned
baseline measurement"). Imports the reference code in place from
/root/reference (read-only; nothing is copied) at the flagship operating
point — 192^3 grid, step_ratio 0.25 -> 1324 samples/ray, 21 classes,
slow-fast instance head (dim_feature_instance=6), slab density field —
and times `TensoRFRenderer.forward` under no_grad with the reference's own
chunk size (2048, inference/render_panopli.py).

Optional heavy deps of the reference (imgviz, trimesh, hdbscan, ...) are
stubbed via a meta-path finder: only the model + renderer modules run.

``--train`` instead times the reference TRAINING step (VERDICT r2 next #3):
phase-1 forward+losses+backward+Adam on the main partition, the segment
stream, and the phase-2 slow-fast instance pass, wired exactly as
trainer/train_panopli_tensorf.py:148-228 — at the same operating point
bench.py --train uses (128^3 grid, 2048 main rays, 1024-ray instance
bundle, 32x1024-ray segment stream, ~443 samples/ray). On this single-core
host the full-size step takes minutes, so each phase is measured at a
reduced ray count and extrapolated linearly (the compute is dense
per-sample matmuls; linearity in rays holds on CPU) — the printout shows
both the measured and the extrapolated numbers.

Usage: python tools/bench_reference_cpu.py [--train] [reference_root]
"""
import importlib.abc
import importlib.machinery
import sys
import time
import types

_STUB_ROOTS = ("imgviz", "trimesh", "hdbscan", "ballpark", "torchvision",
               "matplotlib", "tqdm", "transforms3d", "pyquaternion",
               "torch_efficient_distloss")


class _StubModule(types.ModuleType):
    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        sub = _StubModule(f"{self.__name__}.{name}")
        setattr(self, name, sub)
        return sub


class _StubFinder(importlib.abc.MetaPathFinder, importlib.abc.Loader):
    def find_spec(self, fullname, path=None, target=None):
        if fullname.split(".")[0] in _STUB_ROOTS:
            return importlib.machinery.ModuleSpec(fullname, self,
                                                  is_package=True)
        return None

    def create_module(self, spec):
        return _StubModule(spec.name)

    def exec_module(self, module):
        pass


def _make_rays(rng, n, np):
    origins = rng.uniform(-0.2, 0.2, (n, 3)).astype(np.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return np.concatenate(
        [origins, dirs, np.full((n, 1), 0.01, np.float32),
         np.full((n, 1), 1.5, np.float32)], axis=-1)


def bench_train(ref_root):
    """Reference training-step phases, measured reduced and extrapolated."""
    import numpy as np
    import torch

    sys.path.insert(0, ref_root)
    from model.loss.loss import TVLoss
    from model.radiance_field.tensoRF import TensorVMSplit
    from model.renderer.panopli_tensoRF_renderer import TensoRFRenderer

    grid, num_classes, max_inst = 128, 21, 3
    bbox = torch.tensor([[-1., -1., -1.], [1., 1., 1.]])
    model = TensorVMSplit(
        [grid] * 3, num_density_comps=[16, 16, 16],
        num_appearance_comps=[48, 48, 48], num_semantics_comps=[32, 32, 32],
        num_instance_comps=[32, 32, 32],
        dim_appearance=27, dim_semantics=27, dim_instances=27,
        splus_density_shift=-10, pe_view=2, pe_feat=2, pe_sem=0, pe_ins=0,
        dim_mlp_color=128, dim_mlp_semantics=128, dim_mlp_instance=256,
        num_semantic_classes=num_classes, dim_feature_instance=2 * max_inst,
        use_semantic_mlp=True, use_instance_mlp=True,
        output_mlp_semantics=torch.nn.Softmax(dim=-1))
    renderer = TensoRFRenderer(bbox, tuple([grid] * 3),
                               semantic_weight_mode="softmax")
    renderer.update_step_size(tuple([grid] * 3))  # train step_ratio 0.5
    with torch.no_grad():
        lin = torch.linspace(-1, 1, grid)
        slab = (lin.abs() < 0.12).float()
        model.density_plane[0].data[0, 0] += 14.0 * slab[None, :]
        model.density_line[0].data[0, 0] += 1.0

    inst_params = list(model.render_instance_mlp.parameters())
    inst_ids = {id(p) for p in inst_params}
    main_params = [p for p in model.parameters() if id(p) not in inst_ids]
    opt_main = torch.optim.Adam(main_params, lr=5e-3, betas=(0.9, 0.99))
    opt_inst = torch.optim.Adam(inst_params, lr=5e-4, betas=(0.9, 0.99))
    ce = torch.nn.CrossEntropyLoss(reduction="none")
    tv = TVLoss()
    rng = np.random.default_rng(0)

    def timed(fn, iters=2):
        fn()  # warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            fn()
        return (time.perf_counter() - t0) / iters

    # phase 1 (main rays): reduced 512 of 2048 -> x4
    n_main, full_main = 512, 2048
    rays_m = torch.from_numpy(_make_rays(rng, n_main, np))
    rgbs = torch.rand(n_main, 3)
    sem_t = torch.randint(1, num_classes, (n_main,))
    confs = torch.rand(n_main)

    def phase1():
        opt_main.zero_grad(set_to_none=True)
        out_rgb, out_sem, _, _, _, _ = renderer(model, rays_m, 1.0, False, True)
        loss = torch.nn.MSELoss()(out_rgb, rgbs)
        cfg_tv = type("C", (), dict(late_semantic_optimization=0,
                                    instance_optimization_epoch=0,
                                    lambda_tv_density=0.1,
                                    lambda_tv_appearance=0.1,
                                    lambda_tv_semantics=0.1,
                                    lambda_tv_instances=0.1))()
        loss = loss + model.total_tv_loss(tv, cfg_tv, 1)
        loss = loss + 0.1 * (ce(out_sem, sem_t) * confs).mean()
        loss.backward()
        opt_main.step()

    t1 = timed(phase1)

    # segment stream: reduced 2 of 32 segments (1024 rays each) -> x16
    n_seg, full_seg = 2, 32
    rays_s = torch.from_numpy(_make_rays(rng, n_seg * 1024, np))
    group = torch.arange(n_seg).repeat_interleave(1024)

    def segment():
        opt_main.zero_grad(set_to_none=True)
        feats = renderer.forward_segment_feature(model, rays_s, 1.0, True)
        means = torch.zeros(n_seg, feats.shape[-1])
        means.index_add_(0, group, feats)
        target = (means / 1024)[group].argmax(-1)
        loss = ce(feats, target).mean()
        loss.backward()
        opt_main.step()

    t2 = timed(segment, iters=1)

    # phase 2 (instance bundle): full size (1 image x 1024 rays)
    rays_i = torch.from_numpy(_make_rays(rng, 1024, np))
    labels = torch.randint(0, 3, (1024,))

    def phase2():
        opt_inst.zero_grad(set_to_none=True)
        feats, _ = renderer.forward_instance_feature(model, rays_i, 1.0, True)
        half = feats.shape[-1] // 2
        fast, slow = feats[:, :half], feats[:, half:].detach()
        # slow-fast contrastive core (train_panopli_tensorf.py:304-311)
        fm = torch.zeros(1024, dtype=torch.bool)
        fm[:512] = True
        lm = labels[fm].unsqueeze(1) == labels[~fm].unsqueeze(0)
        sim = torch.exp(-torch.cdist(fast[fm], slow[~fm], p=2))
        logits = torch.exp(sim)
        prob = (logits * lm).sum(-1) / logits.sum(-1)
        loss = -torch.log(prob[prob.ne(0)]).mean()
        loss.backward()
        opt_inst.step()

    t3 = timed(phase2)

    import torch
    full = t1 * (full_main / n_main) + t2 * (full_seg / n_seg) + t3
    nthreads = torch.get_num_threads()
    print(f"reference torch CPU train phases ({nthreads} thread(s), "
          f"measured): main[{n_main} rays] {t1:.2f}s, "
          f"segment[{n_seg}x1024] {t2:.2f}s, instance[1024] {t3:.2f}s")
    print(f"extrapolated full reference step (2048 main + 32x1024 segment + "
          f"1024 instance): {full:.1f}s = {1.0/full:.4f} steps/s on "
          f"{nthreads} thread(s)")


def main():
    import numpy as np
    import torch

    args = [a for a in sys.argv[1:] if a != "--train"]
    ref_root = args[0] if args else "/root/reference"
    sys.meta_path.insert(0, _StubFinder())
    import tqdm
    tqdm.tqdm = lambda x, **k: x
    import ballpark
    ballpark.business = lambda *a, **k: ""
    import torch_efficient_distloss
    torch_efficient_distloss.eff_distloss = lambda w, mid, d: (w * 0).sum()

    import os
    torch.set_num_threads(os.cpu_count() or 1)
    if "--train" in sys.argv[1:]:
        return bench_train(ref_root)

    sys.path.insert(0, ref_root)
    from model.radiance_field.tensoRF import TensorVMSplit
    from model.renderer.panopli_tensoRF_renderer import TensoRFRenderer

    grid, num_classes, max_inst = 192, 21, 3
    bbox = torch.tensor([[-1., -1., -1.], [1., 1., 1.]])
    model = TensorVMSplit(
        [grid] * 3, num_density_comps=[16, 16, 16],
        num_appearance_comps=[48, 48, 48], num_semantics_comps=[32, 32, 32],
        num_instance_comps=[32, 32, 32],
        dim_appearance=27, dim_semantics=27, dim_instances=27,
        splus_density_shift=-10, pe_view=2, pe_feat=2, pe_sem=0, pe_ins=0,
        dim_mlp_color=128, dim_mlp_semantics=128, dim_mlp_instance=256,
        num_semantic_classes=num_classes, dim_feature_instance=2 * max_inst,
        use_semantic_mlp=True, use_instance_mlp=True,
        output_mlp_semantics=torch.nn.Softmax(dim=-1))
    renderer = TensoRFRenderer(bbox, tuple([grid] * 3),
                               semantic_weight_mode="softmax",
                               stop_semantic_grad=True)
    renderer.update_step_size(tuple([grid] * 3))
    renderer.update_step_ratio(renderer.step_ratio * 0.5)  # inference 2x

    with torch.no_grad():
        lin = torch.linspace(-1, 1, grid)
        slab = (lin.abs() < 0.12).float()
        for i in range(3):
            model.density_plane[i].data.zero_()
            model.density_line[i].data.zero_()
        model.density_plane[0].data[0, 0] = 14.0 * slab[None, :]
        model.density_line[0].data[0, 0] = 1.0

    rng = np.random.default_rng(0)
    chunk = 2048
    origins = rng.uniform(-0.2, 0.2, (chunk, 3)).astype(np.float32)
    dirs = rng.normal(size=(chunk, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    rays = torch.from_numpy(np.concatenate(
        [origins, dirs, np.full((chunk, 1), 0.01, np.float32),
         np.full((chunk, 1), 1.5, np.float32)], axis=-1))

    with torch.no_grad():
        renderer(model, rays, 0.0, False, False)  # warmup
        iters = 3
        t0 = time.perf_counter()
        for _ in range(iters):
            renderer(model, rays, 0.0, False, False)
        dt = (time.perf_counter() - t0) / iters
    print(f"reference torch CPU: {dt*1e3:.1f} ms/chunk({chunk}) = "
          f"{chunk/dt:.0f} rays/s on {torch.get_num_threads()} threads")


if __name__ == "__main__":
    main()
