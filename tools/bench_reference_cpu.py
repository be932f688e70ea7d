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

Usage: python tools/bench_reference_cpu.py [reference_root]
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


def main():
    import numpy as np
    import torch

    ref_root = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
    sys.meta_path.insert(0, _StubFinder())
    import tqdm
    tqdm.tqdm = lambda x, **k: x
    import ballpark
    ballpark.business = lambda *a, **k: ""
    import torch_efficient_distloss
    torch_efficient_distloss.eff_distloss = lambda w, mid, d: (w * 0).sum()

    sys.path.insert(0, ref_root)
    from model.radiance_field.tensoRF import TensorVMSplit
    from model.renderer.panopli_tensoRF_renderer import TensoRFRenderer

    import os
    torch.set_num_threads(os.cpu_count() or 1)

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
