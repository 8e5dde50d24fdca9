"""Tests: attributes framework, embeddings, modulations, autodecoder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_transform_rt_roundtrip(rng):
    from nr3d_lib_tpu.models.attributes import TransformMat4x4, TransformRT
    from nr3d_lib_tpu.maths.transforms import axis_angle_to_quaternion

    q = axis_angle_to_quaternion(jnp.asarray(rng.uniform(-1, 1, (8, 3))))
    t = jnp.asarray(rng.standard_normal((8, 3)))
    tf = TransformRT(q, t)
    pts = jnp.asarray(rng.standard_normal((8, 3)))
    out = tf.transform(pts)
    back = tf.inv().transform(out)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-5)

    m44 = tf.mat_4x4()
    assert m44.shape == (8, 4, 4)
    tf2 = TransformMat4x4(m44)
    np.testing.assert_allclose(np.asarray(tf2.transform(pts)), np.asarray(out),
                               atol=1e-5)
    back2 = tf2.inv().transform(out)
    np.testing.assert_allclose(np.asarray(back2), np.asarray(pts), atol=1e-5)

    # jit/pytree compat
    f = jax.jit(lambda tr, p: tr.transform(p))
    np.testing.assert_allclose(np.asarray(f(tf, pts)), np.asarray(out), atol=1e-6)

    # interp1d: midpoint of identity→rot is half-rotation
    from nr3d_lib_tpu.models.attributes import RotationQuaternion

    q0 = axis_angle_to_quaternion(jnp.zeros(3))
    q1 = axis_angle_to_quaternion(jnp.asarray([0.0, 0.0, np.pi / 2]))
    r_mid = RotationQuaternion(q0).interp1d(RotationQuaternion(q1), 0.5)
    v = r_mid.rotate(jnp.asarray([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(v),
                               [np.cos(np.pi / 4), np.sin(np.pi / 4), 0], atol=1e-5)


def test_rotation_reps_agree(rng):
    from nr3d_lib_tpu.models.attributes import (Rotation6D, RotationAxisAngle,
                                                RotationMat3x3, RotationQuaternion)
    from nr3d_lib_tpu.maths.transforms import (axis_angle_to_matrix,
                                               axis_angle_to_quaternion,
                                               matrix_to_rotation_6d)

    aa = jnp.asarray(rng.uniform(-1, 1, (5, 3)))
    m = axis_angle_to_matrix(aa)
    reps = [RotationAxisAngle(aa), RotationQuaternion(axis_angle_to_quaternion(aa)),
            Rotation6D(matrix_to_rotation_6d(m)), RotationMat3x3(m)]
    v = jnp.asarray(rng.standard_normal((5, 3)))
    outs = [np.asarray(r.rotate(v)) for r in reps]
    for o in outs[1:]:
        np.testing.assert_allclose(o, outs[0], atol=1e-5)


def test_camera_intrinsics_family(rng):
    from nr3d_lib_tpu.models.attributes import (FisheyeCameraIntrinsics,
                                                OpenCVCameraIntrinsics,
                                                OrthoCameraIntrinsics,
                                                PinholeCameraIntrinsics)

    intr = PinholeCameraIntrinsics(jnp.asarray(100.0), jnp.asarray(100.0),
                                   jnp.asarray(32.0), jnp.asarray(24.0), 48, 64)
    uv = jnp.asarray(rng.uniform(0, 48, (16, 2)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(1, 5, (16,)).astype(np.float32))
    x = intr.lift(uv, depth)
    uv2, z = intr.proj(x)
    np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), rtol=1e-4)
    half = intr.downscale(2)
    assert half.H == 24 and float(half.fx) == 50.0

    ocv = OpenCVCameraIntrinsics(intr.fx, intr.fy, intr.cx, intr.cy, 48, 64,
                                 jnp.asarray([0.1, -0.05, 0.001, 0.002]))
    x2 = ocv.lift(uv, depth)
    uv3, _ = ocv.proj(x2)
    np.testing.assert_allclose(np.asarray(uv3), np.asarray(uv), atol=1e-3)

    fe = FisheyeCameraIntrinsics(intr.fx, intr.fy, intr.cx, intr.cy, 48, 64,
                                 jnp.asarray([0.01, 0.0, 0.0, 0.0]))
    uv4, _ = fe.proj(jnp.asarray([[0.1, 0.2, 2.0]]))
    assert np.isfinite(np.asarray(uv4)).all()

    ortho = OrthoCameraIntrinsics(jnp.asarray(10.0), jnp.asarray(10.0),
                                  jnp.asarray(32.0), jnp.asarray(24.0))
    xo = ortho.lift(uv, depth)
    uvo, _ = ortho.proj(xo)
    np.testing.assert_allclose(np.asarray(uvo), np.asarray(uv), rtol=1e-5)


def test_segment():
    from nr3d_lib_tpu.models.attributes import Segment

    seg = Segment(jnp.asarray([0, 10]), jnp.asarray([5, 20]))
    v = seg.valid(jnp.asarray([3, 3]))
    np.testing.assert_array_equal(np.asarray(v), [True, False])
    np.testing.assert_array_equal(np.asarray(seg.length()), [5, 10])


def test_embeddings(rng):
    from nr3d_lib_tpu.models.embeddings import (Embedding,
                                                MultiSeqEmbeddingIndividual,
                                                SeqEmbedding)

    emb = Embedding(10, 4, seed=0)
    z = emb(jnp.asarray([0, 3, 9]))
    assert z.shape == (3, 4)
    assert emb.mean_latent().shape == (4,)

    seq = SeqEmbedding(5, 4, seed=1)
    w = np.asarray(seq.weight[...])
    z_mid = np.asarray(seq(jnp.asarray(1.5)))
    np.testing.assert_allclose(z_mid, 0.5 * (w[1] + w[2]), rtol=1e-5)

    multi = MultiSeqEmbeddingIndividual(3, 5, 4, 2, seed=2)
    z = multi(jnp.asarray(1), jnp.asarray(2.0))
    assert z.shape == (6,)


def test_film_siren(rng):
    from nr3d_lib_tpu.models.modulations import FiLMSiren

    net = FiLMSiren(3, 4, z_dim=8, D=2, W=16, seed=0)
    x = jnp.asarray(rng.uniform(-1, 1, (32, 3)).astype(np.float32))
    z1 = jnp.asarray(rng.standard_normal(8).astype(np.float32))
    z2 = jnp.asarray(rng.standard_normal(8).astype(np.float32))
    y1 = net(x, z1)
    y2 = net(x, z2)
    assert y1.shape == (32, 4)
    assert not np.allclose(np.asarray(y1), np.asarray(y2)), \
        "latent must modulate the output"


def test_autodecoder(rng):
    from nr3d_lib_tpu.models.autodecoder import AutoDecoderMixin

    ad = AutoDecoderMixin(5, 8, seed=0)
    z = ad.get_latent(jnp.asarray([0, 2]))
    assert z.shape == (2, 8)
    z_new = ad.infer_latent_init(jax.random.key(1))
    assert z_new.shape == (8,)
