"""Ad-hoc debug dump helpers (io/debug.py) vs the reference macro formats
(Utilities.h:30-102, Utilities.cpp:222-240)."""

import io

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from conftest import random_mask
from srmeetsps_cuda_tpu.io import debug, writers
from srmeetsps_cuda_tpu.ops.gradients import GradientMasks
from srmeetsps_cuda_tpu.ops.grid import masked_select_colmajor
import oracle


class TestPrintFromDevice:
    def test_float_format(self):
        s = io.StringIO()
        debug.print_from_device(jnp.array([1.5, -2.0, 0.25]), stream=s)
        assert s.getvalue() == "[1.5 -2 0.25 ];\n"

    def test_int_format(self):
        s = io.StringIO()
        debug.print_from_device(np.array([[3, 4], [5, 6]]), stream=s)
        assert s.getvalue() == "[3 4 5 6 ];\n"

    def test_masked_colmajor_pack(self, rng):
        z = rng.random((6, 5)).astype(np.float32)
        m = random_mask(rng, 6, 5, blob=False)
        s = io.StringIO()
        debug.print_from_device(z, pack=m, stream=s)
        want = masked_select_colmajor(z, m)
        got = np.fromstring(s.getvalue().strip("[];\n "), sep=" ")
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_print_in_jit(self, capsys):
        @jax.jit
        def f(x):
            debug.print_in_jit(x * 2, name="y")
            return x + 1

        np.asarray(f(jnp.array([1.0, 2.0])))
        jax.effects_barrier()
        assert capsys.readouterr().out == "y = [2 4 ];\n"


class TestWriteMatFromDevice:
    def test_float_roundtrip(self, tmp_path, rng):
        x = rng.standard_normal(17).astype(np.float32)
        p = str(tmp_path / "x.mat")
        debug.write_mat_from_device(jnp.asarray(x), p)
        got = writers.load_mat_any(p)["x"]
        np.testing.assert_array_equal(got.ravel(), x)

    def test_int_dtype_kept(self, tmp_path):
        p = str(tmp_path / "i.mat")
        debug.write_mat_from_device(np.arange(5), p)
        got = writers.load_mat_any(p)["x"]
        assert got.dtype == np.int32
        np.testing.assert_array_equal(got.ravel(), np.arange(5))


class TestPrintSparse:
    def test_operator_format(self):
        s = io.StringIO()
        debug.print_sparse([0, 1], [2, 0], [1.0, -1.0], 2, 3, stream=s)
        assert s.getvalue() == (
            "ii = [1 2  ];\njj = [3 1  ];\nkk = [1 -1  ];\n"
            "rows = 2, cols = 3\n")

    def test_print_operator_matches_oracle(self, rng):
        """Dx printed triplets rebuild the oracle's Dx matrix."""
        h, w = 10, 8
        mask = random_mask(rng, h, w)
        gm = GradientMasks.from_mask(jnp.asarray(mask))

        class P:
            pass

        prob = P()
        prob.mask = mask
        prob.gm = gm
        s = io.StringIO()
        debug.print_operator("Dx", prob, 2, stream=s)
        lines = s.getvalue().splitlines()
        ii = np.fromstring(lines[0].split("[")[1].rstrip(" ];"), sep=" ") - 1
        jj = np.fromstring(lines[1].split("[")[1].rstrip(" ];"), sep=" ") - 1
        kk = np.fromstring(lines[2].split("[")[1].rstrip(" ];"), sep=" ")
        npix = int((mask != 0).sum())
        got = sp.coo_matrix((kk, (ii, jj)), shape=(npix, npix)).toarray()
        dx_o, _, _, _ = oracle.make_gradient(mask.T.ravel(), h, w)
        np.testing.assert_allclose(got, dx_o.toarray(), atol=0)
