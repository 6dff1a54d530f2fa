"""Sharded pipeline on the 8-virtual-device CPU mesh + graft entry points."""
import jax
import numpy as np

from sela_tpu.parallel import (
    data_mesh,
    pad_frames_to_multiple,
    sharded_codec_step,
    sharded_encode_step,
)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    mesh = data_mesh()
    assert mesh.shape == {"data": 8}


def test_sharded_roundtrip_matches_single_device(rng, signal_factory):
    import __graft_entry__ as ge

    x, n_valid = ge._example_batch(F=16, C=2, S=512)
    mesh = data_mesh()
    pcm, exact = sharded_codec_step(mesh)(x, n_valid)
    assert bool(np.asarray(exact).all())
    valid = np.arange(512)[None, None, :] < n_valid[:, None, None]
    np.testing.assert_array_equal(
        np.where(valid, np.asarray(pcm), 0), np.where(valid, x, 0)
    )


def test_sharded_encode_matches_unsharded(rng, signal_factory):
    import __graft_entry__ as ge
    from sela_tpu.codec.pipeline import encode_step

    x, n_valid = ge._example_batch(F=8, C=2, S=512, seed=3)
    mesh = data_mesh()
    sharded = sharded_encode_step(mesh)(x, n_valid)
    plain = encode_step(x, n_valid)
    for key in ("order", "k_res", "k_coeff", "sftype", "nw_res", "nw_coeff"):
        np.testing.assert_array_equal(
            np.asarray(sharded[key]), np.asarray(plain[key]), err_msg=key
        )
    np.testing.assert_array_equal(
        np.asarray(sharded["residues"]), np.asarray(plain["residues"])
    )


def test_pad_frames_to_multiple():
    x = np.ones((5, 2, 16), np.int32)
    nv = np.full(5, 16, np.int32)
    x2, nv2 = pad_frames_to_multiple(x, nv, 8)
    assert x2.shape[0] == 8 and nv2[5:].sum() == 0
    x3, nv3 = pad_frames_to_multiple(x2, nv2, 8)
    assert x3.shape[0] == 8


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out["residues"].shape == args[0].shape
