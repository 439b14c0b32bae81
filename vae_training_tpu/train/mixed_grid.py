"""The ENTIRE mixed-dimension sweep as ONE kernel launch.

``sweep.py --grouped`` previously ran one grid launch per (data_dim,
padding_dim, latent_dim) row because dimensions were compile-time constants
baked into the fused kernel's masks — 7 launches for the linear sweep.
Since the kernels now read per-row dims from the scalar-prefetch buffer
(kernels/linear_vae.py:grid_seed_rows), rows with DIFFERENT dimensions can
share a launch: all 21 linear runs (3 seeds × 7 mixed-dim rows), all 18
sigmoid runs, AND all 15 sphere-MLP runs train in a single ``pallas_call``
each (the MLP family additionally requires uniform hidden widths so the
padded buffer layout matches across rows — true for the 200³ sphere sweep).
This is BASELINE.json config 4 ("full linpadding sweep in one device
launch") taken literally, extended to every sweep family.

Architecture: one :class:`~.grid.GridTrainer` per homogeneous row (it owns
eval/plot/save for its seeds, where shapes must be uniform for ``vmap``);
training concatenates every group's packed (128,128)-tile buffers along the
grid axis and runs the shared kernel, then splits the rows back. Buffers
are identical tiles regardless of row dims, so concatenation is free.
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RunConfig
from .grid import GridTrainer, donation_safe_fallback


class MixedSweepUnavailable(ValueError):
    """The row set is outside the one-launch kernel's envelope (raised by
    MixedGridSweep.__init__ before any IO). Callers catch THIS — not bare
    ValueError — so mid-training errors are never misread as ineligibility
    and silently rerun per-row."""


def _rows_uniform(groups: Sequence[GridTrainer]) -> Tuple[bool, str]:
    ref = groups[0]
    for g in groups[1:]:
        same = (
            g.cfg.batch_size == ref.cfg.batch_size
            and g.cfg.learning_rate == ref.cfg.learning_rate
            and g.cfg.epsilon == ref.cfg.epsilon
            and g.cfg.tunable_decoder_var == ref.cfg.tunable_decoder_var
            and g.cfg.num_batches == ref.cfg.num_batches
            and g.cfg.precision == ref.cfg.precision
            and g.model.dual_sigmoid_decoder == ref.model.dual_sigmoid_decoder
            and type(g.datasets[0]) is type(ref.datasets[0])
            and getattr(g.datasets[0], "var_added", 0.0)
            == getattr(ref.datasets[0], "var_added", 0.0)
            and g.n_print == ref.n_print and g.n_plot == ref.n_plot
        )
        if not same:
            return False, "rows differ in a non-dimension hyperparameter"
    return True, "ok"


def mixed_launch_eligible(groups: Sequence[GridTrainer],
                          interpret: bool = False) -> Tuple[bool, str]:
    """All groups must hit the SAME fused kernel (the linear kernel for
    pure-linear configs, the MLP kernel for hidden-layer configs with
    uniform hidden widths) with identical static hyperparameters (batch,
    lr, epsilon, tdv, decoder head, chunk cadences) — only the DIMS may
    differ across rows. Returns (family, reason): family is 'linear',
    'mlp', or '' when ineligible. ``interpret`` skips the TPU-backend
    check (interpret-mode kernels run anywhere)."""
    from ..kernels.linear_vae import pallas_supported
    from ..kernels.mlp_vae import _layer_dims, _padded_layer_shapes, \
        mlp_pallas_supported

    if not groups:
        return "", "no rows"
    for g in groups:
        if g.mesh is not None:
            return "", "mixed launch is single-chip; use per-row --mesh"
    ok, why = _rows_uniform(groups)
    if not ok:
        return "", why

    if all(pallas_supported(g.model, g.datasets[0], g.cfg,
                            grid_over_mesh=True, interpret=interpret)[0]
           for g in groups):
        return "linear", "ok"
    why_mlp = None
    for g in groups:
        ok, why_mlp = mlp_pallas_supported(g.model, g.datasets[0], g.cfg,
                                           grid_over_mesh=True,
                                           interpret=interpret)
        if not ok:
            return "", why_mlp
    # MLP family: the padded buffer layout must be identical across rows
    # (hidden widths uniform; every data/latent dim ≤ LANE pads to LANE)
    ref = groups[0]

    def shapes(g):
        dual = g.model.dual_sigmoid_decoder
        return _padded_layer_shapes(
            _layer_dims(g.model.encoder_features, g.data_dim),
            _layer_dims(g.model.decoder_features, g.latent_dim), dual)

    ref_shapes = shapes(ref)
    for g in groups[1:]:
        if shapes(g) != ref_shapes or (
            len(g.model.encoder_features) != len(ref.model.encoder_features)
            or len(g.model.decoder_features) != len(ref.model.decoder_features)
        ):
            return "", "rows differ in padded MLP layer layout"
    return "mlp", "ok"


def per_group_chunk(groups, state_grids, n_steps):
    """Drive each group's own (fallback-capable) grid chunk — the mixed
    launch's insurance path, and bench.py's per-row fallback."""
    outs = [g._train_chunk(g.dataset_grid, sg, n_steps)
            for g, sg in zip(groups, state_grids)]
    return tuple(o[0] for o in outs), tuple(o[1] for o in outs)


class MixedGridSweep:
    """Train many heterogeneous-dimension grid rows in one kernel launch.

    ``mesh_spec`` (e.g. ``dp=4``) shards the concatenated ROW axis over the
    device mesh with shard_map — one fused launch per device, zero
    collectives; rows are padded to a multiple of dp with discarded
    duplicates, so any device count works."""

    def __init__(self, groups: List[GridTrainer], mesh_spec: str = "",
                 interpret: bool = False):
        family, why = mixed_launch_eligible(groups, interpret=interpret)
        if not family:
            raise MixedSweepUnavailable(
                f"mixed one-launch sweep unavailable: {why}")
        self._interpret = interpret
        self.groups = groups
        self.cfg: RunConfig = groups[0].cfg
        self.mesh = None
        if mesh_spec:
            from ..parallel.mesh import make_mesh, parse_mesh_spec

            if parse_mesh_spec(mesh_spec).get("tp", 1) > 1:
                raise MixedSweepUnavailable(
                    "mixed sweep shards rows over dp; use a pure dp spec")
            self.mesh = make_mesh(
                mesh_spec,
                allow_uneven=getattr(self.cfg, "mesh_allow_uneven", False))
        if family == "mlp":
            self._build_chunk_mlp()
        else:
            self._build_chunk()
        if self.cfg.kernels == "pallas":
            # strict: a requested backend must never silently degrade — a
            # compile-time failure of the one-launch kernel propagates (the
            # per-group insurance path below would re-enter GridTrainer
            # chunks, which in strict mode are the fused kernel anyway)
            return
        # Runtime insurance (auto): a row set can exceed the kernel's VMEM
        # envelope only at compile time — the first chunk call keeps a host
        # backup and falls back to the per-group chunks (which carry their
        # own pallas→XLA fallback) instead of killing the sweep with
        # donated buffers.
        groups = self.groups

        def per_group_fallback(state_grids, n_steps, external_noise=None):
            if external_noise is not None:
                # the per-group XLA path cannot honor caller-supplied noise
                # streams (the external-noise equivalence contract) — a
                # silent fallback would train on DIFFERENT noise
                raise RuntimeError(
                    "one-launch kernel failed with external noise supplied; "
                    "the per-group XLA fallback cannot honor it")
            return per_group_chunk(groups, state_grids, n_steps)

        self._train_chunk = donation_safe_fallback(
            self._train_chunk,
            per_group_fallback,
            state_argnum=0,
            label="[mixed] one-launch kernel unavailable ({err}); "
                  "per-row launches")

    def _shard_rows(self, run_rows):
        """Wrap a (seeds, a_t, buffers, *extras) → (new_buffers, losses)
        row-kernel in shard_map over dp (identity without a mesh). Every
        operand is row-major; rows are padded to a multiple of dp by
        duplicating leading rows; padded outputs are dropped (their
        training is discarded work, ≤ dp-1 rows). ``extras`` (e.g. the
        equivalence tests' external-noise streams) shard like the rest."""
        if self.mesh is None:
            return run_rows
        mesh = self.mesh
        dp = mesh.shape["dp"]
        from jax.sharding import PartitionSpec as P

        def wrapped(seeds, *operands):
            n = seeds.shape[0]
            pad = (-n) % dp
            # gather-based pad: valid even when pad > n (e.g. 3 rows on
            # dp=8, or 21 rows on dp=64 — a slice x[:pad] would under-pad)
            idx = jnp.arange(n + pad) % n

            def pad_rows(x):
                return jnp.take(x, idx, axis=0) if pad else x

            seeds = pad_rows(seeds)
            operands = jax.tree_util.tree_map(pad_rows, operands)
            new_buffers, losses = jax.shard_map(
                run_rows,
                mesh=mesh,
                in_specs=(P("dp"),) * (1 + len(operands)),
                out_specs=(P("dp"), P("dp")),
                check_vma=False,
            )(seeds, *operands)
            if pad:
                new_buffers = jax.tree_util.tree_map(
                    lambda x: x[:n], new_buffers)
                losses = losses[:n]
            return new_buffers, losses

        return wrapped

    def _build_chunk(self):
        from ..kernels.linear_vae import (
            grid_seed_rows,
            manifold_rows,
            pack_state,
            packed_noise_ok,
            run_fused_chunk,
            unpack_state,
        )

        groups = self.groups
        cfg = self.cfg
        interpret = self._interpret
        tdv = groups[0].model.tunable_decoder_var
        dual = groups[0].model.dual_sigmoid_decoder
        dataset_kind, var_added, _, _ = manifold_rows(groups[0].datasets)

        group_dims, a_t_groups, sizes = [], [], []
        for g in groups:
            _, _, idim, a_t_g = manifold_rows(g.datasets)
            a_t_groups.append(a_t_g)
            group_dims.append((g.data_dim, g.latent_dim, idim))
            sizes.append(len(g.seeds))
        a_t_all = jnp.concatenate(a_t_groups, axis=0)
        total_rows = sum(sizes)
        self.n_rows = total_rows
        # packed in-kernel noise needs every ROW's dims inside a half-lane
        # window; the per-launch static args describe only row 0's layout,
        # so the gate must scan all groups (run_fused_chunk docstring).
        # Note: a launch mixing <=N/2 rows with >N/2 rows disables packing
        # for ALL its rows, so those small rows' trajectories differ from a
        # solo run's (statistically equivalent, not bitwise) — impossible in
        # the reference sweeps, where every dim is far below N/2.
        packed_noise = packed_noise_ok(
            *(d for dims in group_dims for d in dims))
        self._packed_noise = packed_noise
        # Adam live-row bounds must also cover EVERY row (max data/latent);
        # a bound below any row's dims would freeze that row's tail weights
        adam_rows = (max(d[0] for d in group_dims),
                     max(d[1] for d in group_dims))
        self._adam_rows = adam_rows

        @partial(jax.jit, static_argnames=("n_steps",),
                 donate_argnames=("state_grids",))
        def train_chunk(state_grids: Tuple, n_steps: int,
                        external_noise=None):
            all_seeds, all_bufs = [], []
            for gi, sg in enumerate(state_grids):
                dd, ldim, idim = group_dims[gi]
                all_seeds.append(grid_seed_rows(sg, dd, ldim, idim))
                all_bufs.append(jax.vmap(
                    lambda st, dd=dd, ldim=ldim: pack_state(
                        st, dd, ldim, tdv, dual=dual)
                )(sg))
            seeds = jnp.concatenate(all_seeds, axis=0)
            buffers = tuple(
                jnp.concatenate([bufs[j] for bufs in all_bufs], axis=0)
                for j in range(len(all_bufs[0]))
            )

            def run_rows(seeds_r, a_t_r, buffers_r, *noise_r):
                return run_fused_chunk(
                    n_steps=n_steps, seed_and_t0=seeds_r, a_t=a_t_r,
                    buffers=buffers_r, batch=cfg.batch_size,
                    # dims per row come from the scalar-prefetch rows; these
                    # describe only the (irrelevant) host-side layout defaults
                    data_dim=group_dims[0][0], latent_dim=group_dims[0][1],
                    intrinsic_dim=group_dims[0][2],
                    var_added=float(var_added), eps_const=float(cfg.epsilon),
                    tdv=tdv, lr=float(cfg.learning_rate),
                    dataset_kind=dataset_kind, dual=dual,
                    grid_n=seeds_r.shape[0], interpret=interpret,
                    external_noise=tuple(noise_r) if noise_r else None,
                    fp32_dots=getattr(cfg, "precision", "bf16") == "fp32",
                    packed_noise=packed_noise, adam_rows=adam_rows,
                )

            noise_ops = tuple(external_noise) if external_noise else ()
            new_buffers, losses = self._shard_rows(run_rows)(
                seeds, a_t_all, buffers, *noise_ops)
            new_grids, loss_rows, off = [], [], 0
            for gi, sg in enumerate(state_grids):
                n_g = sizes[gi]
                dd, ldim, idim = group_dims[gi]
                bufs_g = tuple(b[off:off + n_g] for b in new_buffers)
                new_grids.append(jax.vmap(
                    lambda st, *bb, dd=dd, ldim=ldim: unpack_state(
                        st, bb, n_steps, dd, ldim, tdv, dual=dual)
                )(sg, *bufs_g))
                loss_rows.append(losses[off:off + n_g])
                off += n_g
            return tuple(new_grids), tuple(loss_rows)

        self._train_chunk = train_chunk

    def _build_chunk_mlp(self):
        """Mixed-dims one-launch chunk on the MLP kernel (the sphere sweep's
        5 rows × 3 seeds, or any uniform-hidden-width MLP row set)."""
        from ..kernels.linear_vae import (
            grid_seed_rows,
            manifold_rows,
            packed_noise_ok,
        )
        from ..kernels.mlp_vae import (
            LANE,
            _layer_dims,
            pack_mlp_state,
            run_mlp_fused_chunk,
            unpack_mlp_state,
        )

        groups = self.groups
        cfg = self.cfg
        interpret = self._interpret
        tdv = groups[0].model.tunable_decoder_var
        dual = groups[0].model.dual_sigmoid_decoder
        dataset_kind, var_added, _, _ = manifold_rows(groups[0].datasets,
                                                      size=LANE)

        group_meta, a_t_groups, sizes = [], [], []
        for g in groups:
            enc_dims = _layer_dims(g.model.encoder_features, g.data_dim)
            dec_dims = _layer_dims(g.model.decoder_features, g.latent_dim)
            _, _, idim, a_t_g = manifold_rows(g.datasets, size=LANE)
            a_t_groups.append(a_t_g)
            group_meta.append((g.data_dim, g.latent_dim, idim,
                               enc_dims, dec_dims))
            sizes.append(len(g.seeds))
        a_t_all = jnp.concatenate(a_t_groups, axis=0)
        total_rows = sum(sizes)
        self.n_rows = total_rows
        # packed in-kernel noise gates on EVERY row's dims fitting a
        # half-lane window (same contract as the linear-family gate above;
        # see run_mlp_fused_chunk / run_fused_chunk docstrings)
        packed_noise = packed_noise_ok(
            *(d for dd, ldim, idim, _, _ in group_meta
              for d in (dd, ldim, idim)))
        self._packed_noise = packed_noise
        # first-layer Adam live-row bounds cover EVERY row (max data/latent)
        adam_l0 = (max(m[0] for m in group_meta),
                   max(m[1] for m in group_meta))
        self._adam_rows = adam_l0

        @partial(jax.jit, static_argnames=("n_steps",),
                 donate_argnames=("state_grids",))
        def train_chunk(state_grids: Tuple, n_steps: int,
                        external_noise=None):
            all_seeds, all_packed = [], []
            for gi, sg in enumerate(state_grids):
                dd, ldim, idim, enc_dims, dec_dims = group_meta[gi]
                all_seeds.append(grid_seed_rows(sg, dd, ldim, idim))
                all_packed.append(jax.vmap(
                    lambda st, e=enc_dims, d=dec_dims: pack_mlp_state(
                        st, e, d, tdv, dual=dual)
                )(sg))
            seeds = jnp.concatenate(all_seeds, axis=0)
            # packed = (ws list, bs list, vec, mws, mbs, mvec, vws, vbs,
            # vvec); concatenate each leaf across groups (padded shapes are
            # identical by eligibility)
            packed = jax.tree_util.tree_map(
                lambda *xs: jnp.concatenate(xs, axis=0), *all_packed)
            dd0, ld0, id0, enc0, dec0 = group_meta[0]

            def run_rows(seeds_r, a_t_r, packed_r, *noise_r):
                return run_mlp_fused_chunk(
                    n_steps=n_steps, seed_and_t0=seeds_r, a_t=a_t_r,
                    packed=packed_r, batch=cfg.batch_size,
                    data_dim=dd0, latent_dim=ld0,
                    enc_dims=enc0, dec_dims=dec0,  # layer COUNTS / pad layout
                    dataset_kind=dataset_kind, intrinsic_dim=id0,
                    var_added=float(var_added), eps_const=float(cfg.epsilon),
                    tdv=tdv, lr=float(cfg.learning_rate),
                    grid_n=seeds_r.shape[0], dual=dual, interpret=interpret,
                    external_noise=tuple(noise_r) if noise_r else None,
                    fp32_dots=getattr(cfg, "precision", "bf16") == "fp32",
                    packed_noise=packed_noise, adam_l0=adam_l0,
                )

            noise_ops = tuple(external_noise) if external_noise else ()
            new_packed, losses = self._shard_rows(run_rows)(
                seeds, a_t_all, packed, *noise_ops)
            new_grids, loss_rows, off = [], [], 0
            for gi, sg in enumerate(state_grids):
                n_g = sizes[gi]
                dd, ldim, idim, enc_dims, dec_dims = group_meta[gi]
                packed_g = jax.tree_util.tree_map(
                    lambda x: x[off:off + n_g], new_packed)
                new_grids.append(jax.vmap(
                    lambda st, pw, pb, pvec, mw, mb, mvec, vw, vb, vvec,
                    e=enc_dims, d=dec_dims, l=ldim: unpack_mlp_state(
                        st, (pw, pb, pvec, mw, mb, mvec, vw, vb, vvec),
                        n_steps, e, d, tdv, l, dual=dual)
                )(sg, *packed_g))
                loss_rows.append(losses[off:off + n_g])
                off += n_g
            return tuple(new_grids), tuple(loss_rows)

        self._train_chunk = train_chunk

    # ------------------------------------------------------------------
    def restore(self, outdirs_per_group: List[List[str]]) -> None:
        """Resume the whole sweep from every row's own checkpoint."""
        for g, outs in zip(self.groups, outdirs_per_group):
            g.restore(outs)
        steps = {g.batchnum for g in self.groups}
        if len(steps) != 1:
            raise ValueError(
                f"sweep groups checkpointed at different steps {sorted(steps)}"
            )

    def train(self, outdirs_per_group: List[List[str]]) -> None:
        import time

        groups = self.groups
        t0 = time.perf_counter()
        for g in groups:
            g.maybe_print_banner()
        t_banner = time.perf_counter() - t0
        total = self.cfg.num_batches
        b = groups[0].batchnum  # 0 fresh; the checkpoint step after restore
        skip_at = groups[0]._skip_events_at
        # wall-clock accounting: where a one-launch sweep actually spends
        # time (train chunks vs stat evals vs plot/save) — printed once at
        # the end so sweep wall times are attributable, not guessed at.
        acct = {"chunk": 0.0, "stats": 0.0, "plot_save": 0.0}
        try:
            while b < total:
                for g in groups:
                    g.batchnum = b
                if b % groups[0].n_print == 0 and b != skip_at:
                    t0 = time.perf_counter()
                    for g in groups:
                        g.compute_and_write_stats()
                    acct["stats"] += time.perf_counter() - t0
                if (b % groups[0].n_plot == 0 or b == total - 1) and b != skip_at:
                    t0 = time.perf_counter()
                    for g, outs in zip(groups, outdirs_per_group):
                        g.plot_all(outs)
                        g.save_all(outs)
                    acct["plot_save"] += time.perf_counter() - t0
                nxt = groups[0]._next_event(b)
                n = nxt - b
                t0 = time.perf_counter()
                state_grids = tuple(g.state_grid for g in groups)
                new_grids, loss_rows = self._train_chunk(state_grids, n)
                for g, ng, lg in zip(groups, new_grids, loss_rows):
                    g.state_grid = ng
                    lg = jax.device_get(lg)
                    for i in range(len(g.seeds)):
                        g.recorders[i].append_train_losses(lg[i])
                acct["chunk"] += time.perf_counter() - t0
                b += n
        except BaseException:
            # flush the last durable checkpoints without masking the error
            from ..runio.background import get_artifact_writer
            get_artifact_writer().drain_quietly()
            raise
        for g in groups:
            g.batchnum = max(total - 1, 0)
        # in-loop plot/save IO rides the artifact-writer thread (grid.py's
        # plot_all/save_all enqueue); flush it so "train returned" keeps
        # meaning "artifacts durable", and account the exposed tail
        t0 = time.perf_counter()
        from ..runio.background import get_artifact_writer
        get_artifact_writer().drain()
        acct["plot_save"] += time.perf_counter() - t0
        n_rows = sum(len(g.seeds) for g in groups)
        print(
            f"[sweep] wall accounting: banners {t_banner:.1f}s (absorbs "
            f"queued setup work), train chunks {acct['chunk']:.1f}s "
            f"(incl. first-call compile), stat evals {acct['stats']:.1f}s, "
            f"plot+save {acct['plot_save']:.1f}s over {n_rows} rows "
            f"(in-loop IO backgrounded; this counts enqueue + exposed tail)",
            flush=True,
        )


def run_mixed_sweep(rows: List[Tuple[RunConfig, Sequence[int], dict]],
                    mesh_spec: str = "", resume: bool = False) -> int:
    """One-launch CLI entry. ``rows`` = [(cfg, seeds, {seed: run_name})].

    ``mesh_spec`` shards the launch's row axis over a dp mesh (the groups
    themselves stay mesh-less — the mixed sweep owns the sharding).
    ``resume`` continues every row from its own checkpoint (a preempted
    sweep restarts where it stopped, artifacts identical to an
    uninterrupted one). Returns 0 on success; raises MixedSweepUnavailable
    (before any IO) when the row set is outside the fused kernel's
    envelope — callers catch exactly that and fall back to per-row grid
    launches. Any other exception (including mid-training ValueErrors)
    propagates.
    """
    import time

    from ..runio.outdir import make_output_dir

    t0 = time.perf_counter()
    groups = [GridTrainer(cfg, seeds) for cfg, seeds, _ in rows]
    # raises if ineligible — before any IO
    sweep = MixedGridSweep(groups, mesh_spec=mesh_spec)
    t_build = time.perf_counter() - t0
    outdirs_per_group = []
    for cfg, seeds, names in rows:
        outs = []
        for seed in seeds:
            sub = cfg.__class__(**{**cfg.to_json_dict()})
            sub.dataset_seed = seed
            outs.append(make_output_dir(
                names[seed], cfg.overwrite, sub, data_dir=cfg.data_dir,
                reuse_existing=resume))
        outdirs_per_group.append(outs)
    if resume:
        sweep.restore(outdirs_per_group)
    sweep.train(outdirs_per_group)
    t0 = time.perf_counter()
    for g, outs in zip(groups, outdirs_per_group):
        g.save_all(outs, final=True)
    print(f"[sweep] wall accounting: setup {t_build:.1f}s, "
          f"final saves {time.perf_counter() - t0:.1f}s", flush=True)
    return 0
