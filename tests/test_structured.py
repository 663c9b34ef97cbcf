"""Structured-index gather fast path (ops/structured.py): detection of
piecewise-affine sparse maps and the windowed-slice lowering must be
EXACTLY equivalent to the gather path — same elements read, zero
contribution from masked lanes — on grid graphs, and must cleanly fall
back on unstructured graphs."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from thallo_tpu.ops import structured


def _take_oracle(src, idx, axis):
    return np.take(np.asarray(src), np.asarray(idx), axis=axis)


class TestDetection:
    def test_contiguous_run(self):
        idx = np.arange(100, dtype=np.int32)
        segs = structured.detect_segments(idx)
        assert segs == ((0, 1, 100, 0, 0, 1),)

    def test_grid_box(self):
        side = 8
        vid = np.arange(side * side).reshape(side, side)
        idx = vid[:, :-1].ravel()  # (8, 7) box, row stride 8
        segs = structured.detect_segments(idx)
        assert segs == ((0, side, side - 1, 0, side, 1),)

    def test_direction_grouped_concat(self):
        side = 6
        vid = np.arange(side * side).reshape(side, side)
        idx = np.concatenate([
            vid[:-1, :].ravel(), vid[1:, :].ravel(),
            vid[:, :-1].ravel(), vid[:, 1:].ravel(),
        ])
        segs = structured.normalize_segments(structured.detect_segments(idx))
        assert segs is not None
        # reconstruct and compare exactly
        rec = np.concatenate([
            structured.col_plan_values(
                (0, H, W, b, c1, c2), H * W)
            for (_s, H, W, b, c1, c2) in segs
        ])
        assert np.array_equal(rec, idx.astype(np.int64))

    def test_random_falls_back(self):
        rng = np.random.default_rng(0)
        idx = rng.integers(0, 64, size=4096).astype(np.int32)
        assert structured.detect_segments(idx) is None

    def test_strided_run(self):
        idx = np.arange(0, 300, 3, dtype=np.int32)
        segs = structured.detect_segments(idx)
        assert segs == ((0, 1, 100, 0, 0, 3),)
        # stride != 1 is not executable: the plan is rejected
        assert structured.normalize_segments(segs) is None

    def test_uniform_repeat(self):
        # sorted observation->point map: each point observed 4 times
        idx = np.repeat(np.arange(64, dtype=np.int32), 4)
        segs = structured.detect_segments(idx)
        assert segs == ((0, 64, 4, 0, 1, 0),)
        assert structured.normalize_segments(segs) == segs


class TestWindows:
    @pytest.mark.parametrize("H,rs,W", [
        (4, 8, 8), (4, 8, 5), (4, 5, 8), (4, 3, 8), (1, 0, 7), (3, 0, 5),
    ])
    def test_window_minor_matches_take(self, H, rs, W):
        rng = np.random.default_rng(1)
        src = rng.normal(size=(3, 64)).astype(np.float32)
        base = 2
        idx = base + np.arange(H)[:, None] * rs + np.arange(W)[None, :]
        out = structured.window_minor(jnp.asarray(src), base, H, rs, W)
        assert out is not None
        ok = idx < 64
        expect = _take_oracle(src, np.minimum(idx, 63).reshape(-1), 1)
        expect = expect.reshape(3, H, W) * ok[None]
        got = np.asarray(out) * ok[None]
        np.testing.assert_array_equal(got, expect)

    @pytest.mark.parametrize("H,rs,W", [(4, 8, 8), (4, 5, 8), (5, 7, 7)])
    def test_window_rows_matches_take(self, H, rs, W):
        rng = np.random.default_rng(2)
        src = rng.normal(size=(64, 5)).astype(np.float32)
        base = 3
        idx = base + np.arange(H)[:, None] * rs + np.arange(W)[None, :]
        out = structured.window_rows(jnp.asarray(src), base, H, rs, W)
        ok = idx < 64
        expect = _take_oracle(src, np.minimum(idx, 63).reshape(-1), 0)
        expect = expect.reshape(H, W, 5) * ok[..., None]
        got = np.asarray(out) * ok[..., None]
        np.testing.assert_array_equal(got, expect)

    def test_out_of_bounds_reads_zero(self):
        src = jnp.ones((2, 10))
        out = structured.window_minor(src, 6, 2, 4, 6)  # reads up to 15
        assert out.shape == (2, 2, 6)
        assert float(out[0, 1, 5]) == 0.0  # position 15 OOB

    @pytest.mark.parametrize("rs", [1, 3])
    def test_window_repeat_minor(self, rs):
        rng = np.random.default_rng(6)
        src = rng.normal(size=(2, 64)).astype(np.float32)
        out = structured.window_minor(jnp.asarray(src), 5, 8, rs, 4,
                                      col_stride=0)
        idx = 5 + np.arange(8) * rs
        expect = np.broadcast_to(src[:, idx][:, :, None], (2, 8, 4))
        np.testing.assert_array_equal(np.asarray(out), expect)

    @pytest.mark.parametrize("rs", [1, 4])
    def test_window_repeat_rows(self, rs):
        rng = np.random.default_rng(7)
        src = rng.normal(size=(64, 3)).astype(np.float32)
        out = structured.window_rows(jnp.asarray(src), 2, 8, rs, 5,
                                     col_stride=0)
        idx = 2 + np.arange(8) * rs
        expect = np.broadcast_to(src[idx][:, None, :], (8, 5, 3))
        np.testing.assert_array_equal(np.asarray(out), expect)


class TestSlotPlans:
    def test_slot_plan_exact(self):
        side = 10
        vid = np.arange(side * side).reshape(side, side)
        idx = np.concatenate([
            vid[:-1, :].ravel(), vid[1:, :].ravel(),
            vid[:, :-1].ravel(), vid[:, 1:].ravel(),
        ]).astype(np.int32)
        plan = structured.slot_gather_plan(idx, side * side)
        assert plan is not None
        rng = np.random.default_rng(3)
        srcT = rng.normal(size=(3, side * side)).astype(np.float32)
        out = structured.apply_slot_plan_minor(jnp.asarray(srcT), plan)
        np.testing.assert_array_equal(
            np.asarray(out), _take_oracle(srcT, idx, 1))

    def test_shuffled_returns_none(self):
        rng = np.random.default_rng(4)
        idx = rng.permutation(1000).astype(np.int32)
        assert structured.slot_gather_plan(idx, 1000) is None

    def test_scatter_overlapping_rows(self):
        """scatter_slot_plan_rows' k>1 overlapping-row branch (c1 < W),
        exercised with a hand-built plan against the segment_sum
        oracle (slot_gather_plan normalizes such boxes away, so this
        path is only reachable by direct callers)."""
        import jax

        H, W, c1, b = 4, 7, 3, 2
        idx = (b + np.arange(H)[:, None] * c1
               + np.arange(W)[None, :]).reshape(-1)
        N = int(idx.max()) + 3
        segs = ((0, H, W, b, c1, 1),)
        rng = np.random.default_rng(10)
        vals = rng.normal(size=(H * W, 2)).astype(np.float32)
        out = structured.scatter_slot_plan_rows(jnp.asarray(vals), segs, N)
        oracle = np.asarray(jax.ops.segment_sum(
            jnp.asarray(vals), jnp.asarray(idx), num_segments=N))
        np.testing.assert_allclose(np.asarray(out), oracle, rtol=1e-6,
                                   atol=1e-6)

    def test_broadcast_rows_slot_plan(self):
        """Identical-row boxes (c1 == 0) stay whole in gather plans
        (broadcast windows) and scatter back correctly."""
        import jax

        row = np.arange(5, 12, dtype=np.int32)
        idx = np.tile(row, 6)  # 6 identical rows
        plan = structured.slot_gather_plan(idx, 20)
        assert plan is not None and len(plan) == 1
        srcT = np.random.default_rng(11).normal(size=(2, 20)).astype(np.float32)
        g = structured.apply_slot_plan_minor(jnp.asarray(srcT), plan)
        np.testing.assert_array_equal(np.asarray(g), srcT[:, idx])
        vals = np.random.default_rng(12).normal(
            size=(len(idx), 2)).astype(np.float32)
        s = structured.scatter_slot_plan_rows(jnp.asarray(vals), plan, 20)
        oracle = np.asarray(jax.ops.segment_sum(
            jnp.asarray(vals), jnp.asarray(idx), num_segments=20))
        np.testing.assert_allclose(np.asarray(s), oracle, rtol=1e-6, atol=1e-6)

    def test_rows_gather_and_scatter_transpose(self):
        """apply_slot_plan_rows == take and scatter_slot_plan_rows ==
        segment_sum on grid-mesh and repeat index arrays."""
        import jax

        side = 8
        vid = np.arange(side * side).reshape(side, side)
        cases = [
            np.concatenate([vid[:-1, :].ravel(), vid[1:, :].ravel(),
                            vid[:, :-1].ravel(), vid[:, 1:].ravel()]),
            np.repeat(np.arange(40), 3),
            np.arange(64),
        ]
        rng = np.random.default_rng(8)
        for idx in cases:
            idx = idx.astype(np.int32)
            N = int(idx.max()) + 1
            plan = structured.slot_gather_plan(idx, N)
            assert plan is not None, idx[:8]
            src = rng.normal(size=(N, 3)).astype(np.float32)
            g = structured.apply_slot_plan_rows(jnp.asarray(src), plan)
            np.testing.assert_array_equal(np.asarray(g), src[idx])
            vals = rng.normal(size=(len(idx), 3)).astype(np.float32)
            s = structured.scatter_slot_plan_rows(jnp.asarray(vals), plan, N)
            oracle = np.asarray(jax.ops.segment_sum(
                jnp.asarray(vals), jnp.asarray(idx), num_segments=N))
            np.testing.assert_allclose(np.asarray(s), oracle, rtol=1e-6,
                                       atol=1e-6)


class TestBsrIntegration:
    def _build(self, side, shuffle=False):
        from thallo_tpu.models import arap_mesh_deformation as arap

        ai = arap.synthetic_inputs(side=side)
        if shuffle:
            ai = arap.shuffle_edges(ai, seed=5)
        spec = arap.make_spec()
        N, E = side * side, len(ai["V0"])
        plan = spec.plan({"N": N, "E": E}, solver="gauss_newton")
        plan.set_solver_parameter("nIterations", 3)
        plan.set_solver_parameter("lIterations", 8)
        plan.init(ai)
        plan.run_steps(3)
        return plan

    def test_grid_arap_plans_detected(self):
        import jax

        from thallo_tpu.models import arap_mesh_deformation as arap
        from thallo_tpu.solver.blocksparse import GroupBsr

        side = 32  # above the dense-JTJ threshold: graph groups go BSR
        ai = arap.synthetic_inputs(side=side)
        spec = arap.make_spec()
        plan = spec.plan({"N": side * side, "E": len(ai["V0"])},
                         solver="gauss_newton")
        plan.init(ai)
        bsrs = [x for x in jax.tree_util.tree_leaves(
            plan._prep, is_leaf=lambda x: isinstance(x, GroupBsr))
            if isinstance(x, GroupBsr)]
        assert bsrs, "ARAP reg group should build a GroupBsr"
        bsr = bsrs[0]
        # every column of every table is affine on a grid mesh
        assert all(p is not None for plans in bsr.perm_plans for p in plans)
        assert all(pl is not None and all(p is not None for p in pl)
                   for pl in bsr.col_plans)

    def test_grid_vs_shuffled_same_answer(self):
        """The structured fast path (grid edges) and the generic gather
        path (shuffled edges) solve the same problem: identical final
        cost (edge order is irrelevant to the energy)."""
        p1 = self._build(32, shuffle=False)
        p2 = self._build(32, shuffle=True)
        c1, c2 = p1.cost(), p2.cost()
        np.testing.assert_allclose(c1, c2, rtol=1e-4)

    def test_ba_repeat_plans_and_equivalence(self):
        """Synthetic BA's sorted uniform observation->point map is a
        repeat segment: the point row table gets per-position planned
        columns; the random camera side falls back; answers match the
        detection-disabled build exactly."""
        import jax

        from thallo_tpu.models import bundle_adjustment as ba
        from thallo_tpu.solver.blocksparse import GroupBsr

        inputs, _ = ba.synthetic_inputs(n_cameras=16, n_points=2048,
                                        obs_per_point=4)
        O = len(inputs["oToC"])

        def run(env_off):
            if env_off:
                os.environ["THALLO_AFFINE"] = "0"
            try:
                spec = ba.make_spec()
                plan = spec.plan({"C": 16, "P": 2048, "O": O},
                                 solver="levenberg_marquardt")
                plan.set_solver_parameter("nIterations", 4)
                plan.set_solver_parameter("lIterations", 8)
                plan.init(inputs)
                f = plan.solve()
                bsrs = [x for x in jax.tree_util.tree_leaves(
                    plan._prep, is_leaf=lambda x: isinstance(x, GroupBsr))
                    if isinstance(x, GroupBsr)]
                return f, bsrs
            finally:
                if env_off:
                    os.environ.pop("THALLO_AFFINE")

        f_on, bsrs = run(False)
        assert bsrs
        planned_tables = [pl for pl in bsrs[0].perm_plans
                          if all(p is not None for p in pl)]
        assert planned_tables, "point row table should be fully planned"
        # the random camera side builds NO table at all since round 3:
        # 16 cameras run one-hot row mode (MXU segment-sum aggregation)
        assert any(x is not None for x in bsrs[0].oh_idxs), \
            "small camera image should run one-hot row mode"
        f_off, _ = run(True)
        np.testing.assert_allclose(f_on, f_off, rtol=1e-6)

    def test_affine_env_off_same_answer(self):
        """THALLO_AFFINE=0 must produce the same solve (plans are a pure
        execution detail)."""
        p1 = self._build(32)
        c_on = p1.cost()
        os.environ["THALLO_AFFINE"] = "0"
        try:
            p2 = self._build(32)
            c_off = p2.cost()
        finally:
            os.environ.pop("THALLO_AFFINE")
        np.testing.assert_allclose(c_on, c_off, rtol=1e-5)

    def test_update_inputs_structure_change_retraces(self):
        """Swapping a structured (grid) graph for an unstructured
        (shuffled) one via update_inputs must drop the affine plans and
        retrace (plans ride the consts pytree as static aux): the
        continued solve matches a from-scratch shuffled solve."""
        from thallo_tpu.models import arap_mesh_deformation as arap

        side = 32
        ai = arap.synthetic_inputs(side=side)
        rng = np.random.default_rng(9)
        order = rng.permutation(len(ai["V0"]))
        sh_v0 = np.asarray(ai["V0"])[order]
        sh_v1 = np.asarray(ai["V1"])[order]

        spec = arap.make_spec()
        N, E = side * side, len(ai["V0"])
        plan = spec.plan({"N": N, "E": E}, solver="gauss_newton")
        plan.set_solver_parameter("nIterations", 6)
        plan.set_solver_parameter("lIterations", 8)
        plan.init(ai)
        plan.run_steps(2)  # grid edges: affine plans active
        plan.update_inputs({"V0": sh_v0, "V1": sh_v1})
        plan.run_steps(2)  # shuffled: plans must be gone, gather path

        # oracle: same trajectory built from scratch (edge order is
        # energy-invariant, so both phases solve the same problem)
        plan2 = spec.plan({"N": N, "E": E}, solver="gauss_newton")
        plan2.set_solver_parameter("nIterations", 6)
        plan2.set_solver_parameter("lIterations", 8)
        plan2.init(ai)
        plan2.run_steps(4)
        np.testing.assert_allclose(plan.cost(), plan2.cost(), rtol=1e-4)

    def test_affine_env_off_same_answer_small(self):
        """Below the BSR threshold (dense-JTJ schedule) the row-major
        gather/scatter path carries the plans — same answer with
        detection off."""
        p1 = self._build(8)
        c_on = p1.cost()
        os.environ["THALLO_AFFINE"] = "0"
        try:
            p2 = self._build(8)
            c_off = p2.cost()
        finally:
            os.environ.pop("THALLO_AFFINE")
        np.testing.assert_allclose(c_on, c_off, rtol=1e-5)
