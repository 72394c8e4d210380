"""Driver entry-point contract tests (CPU virtual mesh)."""

import sys

import jax
import pytest

sys.path.insert(0, "/root/repo")


def _needs_devices(n):
    return pytest.mark.skipif(
        len(jax.devices()) < n,
        reason=f"needs a {n}-device mesh — the driver runs dryrun_multichip "
               "under xla_force_host_platform_device_count; on the 1-chip "
               "TPU suite this is the CPU-mesh conftest's job")


@_needs_devices(8)
def test_dryrun_multichip_8():
    import __graft_entry__ as g
    g.dryrun_multichip(8)  # asserts finite loss internally


def test_entry_signature():
    import __graft_entry__ as g
    fn, args = g.entry()
    assert callable(fn)
    assert len(args) == 4  # params, image, intrinsics, pose
    # traceable (no compile): abstract eval only
    import jax
    shapes = jax.eval_shape(fn, *args)
    rgb, disp = shapes
    assert rgb.shape == (1, 256, 768, 3)
    assert disp.shape == (1, 2, 256, 768, 1)


@_needs_devices(2)
def test_dryrun_multichip_2():
    import __graft_entry__ as g
    g.dryrun_multichip(2)
