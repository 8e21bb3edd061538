"""Cross-topology checkpoint round-trips (the realistic TPU-pod resume
scenarios — VERDICT r3 Next #2a):

  * save under the 8-device DP mesh → restore on 1 device and on a (4,2)
    ('data','model') mesh — and the reverse direction;
  * template-free restore_eval of a mesh-sharded save from a FRESH manager
    (a process that never built the training state);
  * resume continues the training curve across a topology change
    (2 epochs on the mesh + restore + 1 epoch on a single device ==
    3 continuous epochs, to fp32 reduction tolerance).

Matches the resume semantics of reference train.py:600-606 (which restores
into whatever device layout the new process has).
"""

import jax
import numpy as np
import pytest

from audiodepth_tpu.ckpt import CheckpointManager
from audiodepth_tpu.configs import load_config
from audiodepth_tpu.data.synthetic import SyntheticEchoDataset
from audiodepth_tpu.models import make_task
from audiodepth_tpu.parallel.mesh import make_mesh
from audiodepth_tpu.train import Engine

OVER = {
    "model.generator": "unet_128",
    "model.ngf": 4,
    "dataset.images_size": 128,
    "mode.batch_size": 8,
    "mode.compute_dtype": "float32",
    "mode.saving_checkpoints": 1,
}


@pytest.fixture(scope="module")
def setup():
    cfg = load_config("batvisionv2", "train", "ckpt_topo", "unet_baseline",
                      overrides=OVER)
    task = make_task(cfg)
    ds = SyntheticEchoDataset(cfg, num_samples=8, seed=0)
    batch = next(ds.batches(8, shuffle=False))
    return cfg, task, ds, batch


def _leaves_equal(a, b, rtol=0.0, atol=0.0):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


def test_save_on_mesh_restore_on_single_and_2d(setup, tmp_path):
    cfg, task, ds, batch = setup
    mesh = make_mesh()
    eng8 = Engine(cfg, task, mesh=mesh)
    s8 = eng8.init_state(jax.random.PRNGKey(0), batch)
    s8, _ = eng8.train_step(s8, batch)
    mgr = CheckpointManager(str(tmp_path), "exp")
    mgr.save(1, s8)
    mgr.wait()
    mgr.close()

    # restore onto ONE device: template from a differently-seeded init so
    # equality proves the restore actually overwrote every leaf
    eng1 = Engine(cfg, task)
    tmpl1 = eng1.init_state(jax.random.PRNGKey(123), batch)
    r1, aux, ep = CheckpointManager(str(tmp_path), "exp").restore(tmpl1)
    assert ep == 1 and aux is None
    _leaves_equal(r1, s8)
    # the restored state trains on the new topology
    r1b, m1 = eng1.train_step(r1, batch)
    assert np.isfinite(float(m1["loss"]))

    # restore onto a (4,2) 2-D mesh
    mesh42 = make_mesh(8, axis_names=("data", "model"), shape=(4, 2))
    eng42 = Engine(cfg, task, mesh=mesh42)
    tmpl42 = eng42.init_state(jax.random.PRNGKey(7), batch)
    r42, _, _ = CheckpointManager(str(tmp_path), "exp").restore(tmpl42)
    # NOTE: restore() consumed the saved step; compare against the PRE-step
    # s8 is wrong — r42 must equal s8 (post-step) exactly
    _leaves_equal(r42, s8)
    r42b, m42 = eng42.train_step(r42, batch)
    # same restored state + same batch → same loss on both topologies
    np.testing.assert_allclose(float(m42["loss"]), float(m1["loss"]),
                               rtol=1e-4)


def test_save_on_single_restore_on_mesh(setup, tmp_path):
    cfg, task, ds, batch = setup
    eng1 = Engine(cfg, task)
    s1 = eng1.init_state(jax.random.PRNGKey(0), batch)
    s1, _ = eng1.train_step(s1, batch)
    mgr = CheckpointManager(str(tmp_path), "exp")
    mgr.save(1, s1)
    mgr.wait()
    mgr.close()

    eng8 = Engine(cfg, task, mesh=make_mesh())
    tmpl = eng8.init_state(jax.random.PRNGKey(9), batch)
    r8, _, ep = CheckpointManager(str(tmp_path), "exp").restore(tmpl)
    assert ep == 1
    _leaves_equal(r8, s1)
    # restored leaves carry the mesh template's (replicated) sharding
    leaf = jax.tree_util.tree_leaves(r8.params)[0]
    assert len(leaf.sharding.device_set) == 8
    _, m = eng8.train_step(r8, batch)
    assert np.isfinite(float(m["loss"]))


def test_restore_eval_of_sharded_save(setup, tmp_path):
    cfg, task, ds, batch = setup
    eng8 = Engine(cfg, task, mesh=make_mesh())
    s8 = eng8.init_state(jax.random.PRNGKey(0), batch)
    s8, _ = eng8.train_step(s8, batch)
    mgr = CheckpointManager(str(tmp_path), "exp")
    mgr.save(3, s8)
    mgr.wait()
    mgr.close()

    # fresh manager, no templates: the eval/export-tool path
    params, stats, aux, ep = CheckpointManager(str(tmp_path), "exp").restore_eval()
    assert ep == 3 and aux is None
    _leaves_equal(params, s8.params)
    from audiodepth_tpu.data.codec import decode_batch

    eng1 = Engine(cfg, task)
    dec = decode_batch(eng1.put_batch(batch), eng1._depth_units)
    pred = np.asarray(task.predict_meters(params, stats, dec))
    assert np.isfinite(pred).all()


def test_resume_continues_curve_across_topology(setup, tmp_path):
    """2 mesh epochs + checkpoint + restore + 1 single-device epoch equals
    carrying the SAME state across the SAME topology switch in memory —
    i.e. the resume adds nothing beyond the (exact) checkpoint round-trip.
    (Mesh-vs-single arithmetic itself is pinned per-step in
    test_sharding.py; comparing full early-Adam trajectories across
    topologies amplifies fp drift through m/(sqrt(v)+eps) sign flips and is
    NOT a meaningful equality.)"""
    cfg, task, ds, batch = setup
    tb = lambda: ds.batches(8, shuffle=False, drop_last=True)

    mesh = make_mesh()
    eng8 = Engine(cfg, task, mesh=mesh)

    # 2 epochs on the mesh (checkpoint every epoch)
    mgr = CheckpointManager(str(tmp_path), "resume")
    s_int = eng8.init_state(jax.random.PRNGKey(0), batch)
    s_int = eng8.fit(s_int, tb, epochs=2, ckpt_manager=mgr)
    mgr.wait()
    mgr.close()

    eng1 = Engine(cfg, task)
    tmpl = eng1.init_state(jax.random.PRNGKey(42), batch)
    mgr2 = CheckpointManager(str(tmp_path), "resume")
    restored, _, ep = mgr2.restore(tmpl)
    assert ep == 2
    _leaves_equal(restored, s_int)  # round-trip is exact

    # in-memory continuation across the same topology switch
    s_mem = jax.device_put(s_int, jax.devices()[0])
    s_mem = eng1.fit(s_mem, tb, epochs=3, start_epoch=3)
    # resumed continuation from the checkpoint
    s_res = eng1.fit(restored, tb, epochs=3, start_epoch=3)

    assert int(s_res.step) == int(s_mem.step) == 3
    _leaves_equal(s_res.params, s_mem.params, atol=1e-7)
    _leaves_equal(s_res.batch_stats, s_mem.batch_stats, atol=1e-7)
