"""Fused-towers PNA layer — the performance variant of ``PNALayerSparse``.

The reference loops towers in Python, giving T separate small matmuls whose
output widths (out_dim/T) waste most of the 128-wide MXU
(``models/dgl/pna_layer.py:130-139``).  Here the layer is restructured around
TPU cost realities (math identical; tests/test_fused_layer.py checks
equivalence with ported weights):

* **No data-side transposes or broadcasts.**  Every tensor stays in its
  producer's natural layout; all reordering moves into the (tiny) weight
  tensors, rearranged statically per step.  The pretrans concat(src, dst, e)
  is never materialized — the first matmul is split along its rows into
  K_src/K_dst/K_e applied directly to the gathered tensors.
* **Shared inputs are never tiled.**  With ``divide_input=False`` every tower
  sees the same input; instead of broadcasting to [E, T, F] (T x HBM
  traffic) the contraction 'ef,tfo->eto' funnels one copy through the MXU.
* **The scaler cross-product is never materialized.**  Degree scalers are
  per-node scalars, so the posttrans contraction runs on the raw aggregator
  tensor Z [N, A, T, F] and the S scaler weights apply to the (A*S x
  narrower) [N, T, O, S] output: out = sum_s w[n,s] * (Z . K[s]) instead of
  (w*Z) . K.  Saves S x HBM traffic through the widest tensor of the layer
  in both passes.
* **Custom-VJP aggregation** (pna_tpu/ops/fused_vjp.py): scatter-free
  backward via node partials + one wide gather.
* ``compute_dtype=jnp.bfloat16`` runs gathers and matmuls in bf16 (f32
  accumulation via preferred_element_type; statistics, batch-norm and the
  residual stay f32).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pna_tpu.graph import Graph
from pna_tpu.nn.layers import xavier_uniform_gain
from pna_tpu.nn.sparse import MaskedBatchNorm, aggregate_bank


def _stacked_xavier(in_size):
    base = xavier_uniform_gain(1.0 / in_size)

    def init(key, shape, dtype=jnp.float32):
        keys = jax.random.split(key, shape[0])
        return jnp.stack([base(k, shape[1:], dtype) for k in keys])
    return init


class StackedParams(nn.Module):
    """Parameter container for per-tower MLP weights: kernel_i [T, in, out],
    bias_i [T, out] — the exact stacking of T FCLayer towers, so reference
    weights port 1:1 (tests/test_fused_layer.py)."""
    dims: Sequence[int]
    towers: int

    @nn.compact
    def __call__(self):
        ks, bs = [], []
        for i in range(len(self.dims) - 1):
            ks.append(self.param(f'kernel_{i}', _stacked_xavier(self.dims[i]),
                                 (self.towers, self.dims[i], self.dims[i + 1])))
            bs.append(self.param(f'bias_{i}', nn.initializers.zeros,
                                 (self.towers, self.dims[i + 1])))
        return ks, bs


class StackedMLP(nn.Module):
    """Per-tower MLPs with stacked kernels: [N..., T, in] -> [N..., T, out]
    via einsum (relu between layers, none at the end — matches
    models/layers.py MLP with mid relu / last none)."""
    hidden: int
    out: int
    layers: int
    towers: int

    @nn.compact
    def __call__(self, x):  # x: [..., T, F_in]
        dims = ([x.shape[-1]] + [self.hidden] * (self.layers - 1) + [self.out]
                if self.layers > 1 else [x.shape[-1], self.out])
        for i in range(len(dims) - 1):
            k = self.param(f'kernel_{i}',
                           _stacked_xavier(dims[i]),
                           (self.towers, dims[i], dims[i + 1]))
            b = self.param(f'bias_{i}', nn.initializers.zeros,
                           (self.towers, dims[i + 1]))
            x = jnp.einsum('...tf,tfo->...to', x, k) + b
            if i < len(dims) - 2:
                x = jax.nn.relu(x)
        return x


def _mlp_dims(in_size, hidden, out, layers):
    return ([in_size] + [hidden] * (layers - 1) + [out] if layers > 1
            else [in_size, out])


class PNALayerFused(nn.Module):
    """Drop-in equivalent of PNALayerSparse with the tower loop vectorized."""
    out_dim: int
    aggregators: Sequence[str]
    scalers: Sequence[str]
    avg_d: dict
    dropout: float = 0.0
    graph_norm: bool = False
    batch_norm: bool = False
    towers: int = 1
    pretrans_layers: int = 1
    posttrans_layers: int = 1
    divide_input: bool = True
    residual: bool = False
    edge_features: bool = False
    compute_dtype: Optional[jnp.dtype] = None   # e.g. jnp.bfloat16
    # aggregation backend: 'auto' picks bucketed > ELL > generic (measured
    # ranking on v5e); 'pallas' forces the hand-written sorted-edge moment
    # sketch kernel (pna_tpu/ops/pallas_kernels.py, needs graph.edge_ptr);
    # 'bucketed' / 'ell' / 'generic' force the respective XLA paths.
    kernel: str = 'auto'
    # static in-degree bound hint for the Pallas kernel's segmented scan
    max_degree: int = 0
    pallas_interpret: bool = False   # CPU tests run the kernel interpreted
    # cross-device BatchNorm statistics (mesh axis name(s), used under
    # shard_map in the edge-partitioned distributed path)
    bn_axis_name: Optional[Any] = None
    # tower tensor-parallelism: mesh axis the ``towers`` dimension of the
    # stacked pretrans/posttrans weights is sharded over (see
    # pna_tpu/parallel/tower_tp.py).  When set, per-tower contractions run as
    # batched einsums with sharding constraints on the tower axis (each
    # device computes its own towers; the towers in the reference are
    # independent channel groups, models/pytorch/pna/layer.py:90-106) instead
    # of the single block-diagonal matmul, and GSPMD gathers only at the
    # mixing FC.
    tp_axis: Optional[str] = None

    @nn.compact
    def __call__(self, graph: Graph, h, e=None, train: bool = False,
                 sender_table=None, overlap=None):
        """``sender_table`` (distributed path): a [Nl + halo, F] ghost feature
        table — local node features followed by halo-exchanged remote sender
        features — that ``graph.senders`` indexes into.  ``None`` (default)
        gathers senders from ``h`` itself (single-device semantics).

        ``overlap`` (distributed path, comm/compute overlap): a tuple
        ``(halo, senders_l, receivers_l, mask_l, senders_b, receivers_b,
        mask_b)`` from ``pna_tpu.parallel.partition.split_edges`` — the
        LOCAL-sender edges are pretransformed and partially aggregated with
        no data dependence on ``halo`` (the ``all_to_all`` result), so the
        latency-hiding scheduler can run them during the collective; the
        boundary partial is combined afterwards (exact — the bank factors
        through a commutative moment sketch, pna_tpu/ops/partial_stats.py)."""
        in_dim = h.shape[-1]
        T = self.towers
        assert (not self.divide_input) or in_dim % T == 0
        assert self.out_dim % T == 0
        Ft = in_dim // T if self.divide_input else in_dim
        Fo = self.out_dim // T
        Fe = e.shape[-1] if self.edge_features else 0
        A, S = len(self.aggregators), len(self.scalers)
        residual = self.residual and in_dim == self.out_dim
        h_in = h
        N = h.shape[0]
        E = graph.senders.shape[0]
        cdt = self.compute_dtype or h.dtype

        pre_dims = _mlp_dims(2 * Ft + Fe, Ft, Ft, self.pretrans_layers)
        post_dims = _mlp_dims((A * S + 1) * Ft, Fo, Fo, self.posttrans_layers)
        pre_ks, pre_bs = StackedParams(pre_dims, T, name='pretrans')()
        post_ks, post_bs = StackedParams(post_dims, T, name='posttrans')()

        # All per-tower contractions are emitted as ONE plain matmul with a
        # block-structured weight built on the (tiny) weight side — XLA
        # lowers batched/multi-axis einsums on these shapes as convolutions
        # with poor MXU tiling; a single [rows, cols] dot is ~5-20x faster
        # here even though the block-diagonal zeros cost T x the FLOPs.
        # Under tower TP (tp_axis) the batched einsum is used instead: the
        # tower axis is sharded, each device contracts only its towers.
        def _constrain_towers(y):
            # y [..., T, fo]: shard the tower axis over the TP mesh axis
            from jax.sharding import PartitionSpec
            spec = PartitionSpec(*([None] * (y.ndim - 2)), self.tp_axis, None)
            return jax.lax.with_sharding_constraint(y, spec)

        def ein(x, k):  # x [.., T, fi], k [T, fi, fo] -> [.., T, fo]
            T_, fi, fo = k.shape
            if self.tp_axis is not None:
                y = jnp.einsum('...tf,tfo->...to', x.astype(cdt),
                               k.astype(cdt),
                               preferred_element_type=jnp.float32)
                return _constrain_towers(y)
            eye = jnp.eye(T_, dtype=cdt)
            kb = jnp.einsum('tio,ts->tiso', k.astype(cdt), eye)
            kb = kb.reshape(T_ * fi, T_ * fo)
            lead = x.shape[:-2]
            y = jnp.einsum('...k,ko->...o', x.reshape(lead + (T_ * fi,))
                           .astype(cdt), kb,
                           preferred_element_type=jnp.float32)
            return y.reshape(lead + (T_, fo))

        def ein_shared(x, k):  # input shared across towers
            T_, fi, fo = k.shape
            if self.tp_axis is not None:
                y = jnp.einsum('...f,tfo->...to', x.astype(cdt),
                               k.astype(cdt),
                               preferred_element_type=jnp.float32)
                return _constrain_towers(y)
            kb = jnp.transpose(k.astype(cdt), (1, 0, 2)).reshape(fi, T_ * fo)
            y = jnp.einsum('...k,ko->...o', x.astype(cdt), kb,
                           preferred_element_type=jnp.float32)
            return y.reshape(x.shape[:-1] + (T_, fo))

        # ---- pretrans: split-kernel first layer, no concat materialized ----
        from pna_tpu.ops import bucketed
        hb = h.astype(cdt)
        k0, b0 = pre_ks[0], pre_bs[0]
        k_src, k_dst = k0[:, :Ft], k0[:, Ft:2 * Ft]

        def pretrans(src, dst, eterm=None):
            K = src.shape[0]
            if self.divide_input:
                m = (ein(src.reshape(K, T, Ft), k_src)
                     + ein(dst.reshape(K, T, Ft), k_dst))
            else:
                m = ein_shared(src, k_src) + ein_shared(dst, k_dst)
            if eterm is not None:
                m = m + ein_shared(eterm, k0[:, 2 * Ft:])
            m = m + b0
            for i in range(1, self.pretrans_layers):
                m = ein(jax.nn.relu(m), pre_ks[i]) + pre_bs[i]
            return m      # [K, T, Ft], flat view is tower-major [K, T*Ft]

        from pna_tpu.ops import (fused_vjp, pallas_bank, pallas_fused,
                                 partial_stats)
        from pna_tpu.ops.pallas_kernels import pretrans_fits_vmem
        scalers_ok = all(s in fused_vjp._SCALERS for s in self.scalers)

        # fully-fused path (kernel='pallas_fused'): pretrans + moment sketch
        # in one Pallas kernel per pass — the [E, T*Ft] message tensor never
        # exists in HBM (VERDICT r4 item 2).  Requires the sorted layout,
        # a single pretrans layer (the kernel computes u[snd] + v[rcv]
        # [+ e @ Ke] only) and the u tile fitting VMEM.
        fused_pre = self.kernel == 'pallas_fused' and overlap is None
        if fused_pre:
            if graph.edge_ptr is None:
                raise ValueError("kernel='pallas_fused' requires "
                                 "graph.edge_ptr "
                                 "(batch_graphs(sort_edges=True))")
            if not (scalers_ok and 'identity' not in self.aggregators
                    and pallas_fused.supports(self.aggregators)):
                raise ValueError("kernel='pallas_fused' requires supported "
                                 "aggregators/scalers, got "
                                 f"{self.aggregators}/{self.scalers}")
            if self.pretrans_layers != 1:
                raise ValueError("kernel='pallas_fused' supports "
                                 "pretrans_layers=1 only")
            if not pretrans_fits_vmem(N, 2 if cdt == jnp.bfloat16 else 4):
                raise ValueError(
                    f"kernel='pallas_fused': u tile for N={N} exceeds VMEM; "
                    "use kernel='pallas'")

        Z = deg = moments = None
        if overlap is not None:
            # ---- split local/boundary aggregation (comm/compute overlap) --
            if not (scalers_ok and partial_stats.supports(self.aggregators)):
                raise ValueError("overlap path requires sketch-decomposable "
                                 f"aggregators/scalers, got "
                                 f"{self.aggregators}/{self.scalers}")
            # edge features live with their edge: the split carries them as
            # pre-gathered e_l/e_b (no exchange, masked positions discarded
            # by the partial sketches)
            halo, s_l, r_l, m_l, s_b, r_b, m_b = overlap[:7]
            e_l = e_b = None
            if self.edge_features:
                if len(overlap) != 9:
                    raise ValueError("overlap with edge_features needs "
                                     "(..., e_local, e_bound) — split the "
                                     "embedded edge features with "
                                     "SplitEdges.idx_local/idx_bound")
                e_l, e_b = overlap[7:]
            msg_l = pretrans(hb[s_l], hb[r_l], e_l)
            sk_l = partial_stats.partial_sketch(
                msg_l.reshape(s_l.shape[0], T * Ft), r_l, N, m_l)
            msg_b = pretrans(halo.astype(cdt)[s_b], hb[r_b], e_b)
            sk_b = partial_stats.partial_sketch(
                msg_b.reshape(s_b.shape[0], T * Ft), r_b, N, m_b)
            sk = partial_stats.combine(sk_l, sk_b)
            Z = partial_stats.finalize_bank(sk, tuple(self.aggregators))
            deg = sk.cnt
        elif fused_pre:
            # node-level pretrans halves: u = h W_src (flat tower-major),
            # v = h W_dst + b0; the per-edge message u[snd] + v[rcv]
            # (+ e @ Ke) is formed inside the kernels only
            h_src = hb if sender_table is None else sender_table.astype(cdt)
            if self.divide_input:
                u = ein(h_src.reshape(-1, T, Ft), k_src)
                vv = ein(hb.reshape(N, T, Ft), k_dst)
            else:
                u = ein_shared(h_src, k_src)
                vv = ein_shared(hb, k_dst)
            u = u.reshape(-1, T * Ft).astype(cdt)
            vv = (vv + b0).reshape(N, T * Ft).astype(cdt)
            ef = ke_flat = None
            if self.edge_features:
                ef = e.astype(cdt)
                ke_flat = jnp.transpose(k0[:, 2 * Ft:].astype(cdt),
                                        (1, 0, 2)).reshape(Fe, T * Ft)
        else:
            src = (hb if sender_table is None
                   else sender_table.astype(cdt))[graph.senders]  # [E, in_dim]
            if graph.bucket_spec is not None:
                # receiver "gather" is a broadcast in the bucketed layout
                dst = bucketed.expand_to_edges(hb, graph.bucket_spec)
            else:
                dst = hb[graph.receivers]
            msg = pretrans(src, dst, e if self.edge_features else None)

        # ---- aggregation ----
        no_ident = 'identity' not in self.aggregators
        kern = self.kernel
        have_z = Z is not None                     # overlap path already did
        bucket_fast = (not have_z and graph.bucket_spec is not None
                       and scalers_ok
                       and no_ident and bucketed.supports(self.aggregators)
                       and kern in ('auto', 'bucketed'))
        ell_fast = (not have_z and graph.nbr_edge_ids is not None
                    and no_ident
                    and fused_vjp.supports(self.aggregators, self.scalers)
                    and kern in ('auto', 'ell'))
        # auto backend ranking (BENCH_kernels.json, v5e full-step):
        # bucketed 9.6ms > ell 20.0ms > pallas (sorted-edge sketch, the only
        # static-layout-free fast path; 13.1ms when forced on the molecular
        # config and the design case for large/skewed graphs where ELL and
        # bucketing are infeasible) > generic segment 35.9ms.  Under 'auto'
        # the pallas kernel is selected only when neither static layout
        # exists — exactly the large-graph regime — and only on TPU (CPU
        # tests must opt in via pallas_interpret).
        pallas_ok = (not have_z and graph.edge_ptr is not None
                     and scalers_ok and no_ident
                     and pallas_bank.supports(self.aggregators))
        pallas_fast = pallas_ok and (
            kern == 'pallas'
            or (kern == 'auto' and not bucket_fast and not ell_fast
                and (self.pallas_interpret
                     or jax.default_backend() == 'tpu')))
        if kern == 'pallas' and not (pallas_fast or have_z):
            raise ValueError("kernel='pallas' requires graph.edge_ptr "
                             "(batch_graphs(sort_edges=True)) and supported "
                             "aggregators/scalers")
        if bucket_fast:
            ell_fast = pallas_fast = False
        if have_z or bucket_fast or ell_fast or pallas_fast or fused_pre:
            # store the edge messages (the widest tensor of the layer) in the
            # compute dtype: the banks upcast to f32 at the reduction inputs
            # (convert fuses into the reduce), so accumulation stays f32 while
            # HBM traffic through [E, T*Ft] halves under bf16
            if not have_z and not fused_pre:
                msg = msg.astype(cdt)
            if have_z:
                pass                               # overlap path set Z/deg
            elif fused_pre:
                bank = pallas_fused.make_fused_pretrans_bank(
                    graph.senders, graph.receivers, graph.edge_mask,
                    graph.edge_ptr, max_degree=self.max_degree,
                    interpret=self.pallas_interpret)
                Z = bank(u, vv, ef, ke_flat, tuple(self.aggregators))
                ptr = graph.edge_ptr
                if graph.edge_mask is not None:
                    n_real = jnp.sum(graph.edge_mask.astype(jnp.int32))
                    ptr = jnp.minimum(ptr, n_real)
                deg = (ptr[1:] - ptr[:-1]).astype(jnp.float32)
            elif pallas_fast:
                bank = pallas_bank.make_pallas_raw_bank(
                    graph.receivers, graph.edge_mask, graph.edge_ptr,
                    max_degree=self.max_degree,
                    interpret=self.pallas_interpret)
                Z = bank(msg.reshape(E, T * Ft), tuple(self.aggregators))
                ptr = graph.edge_ptr
                if graph.edge_mask is not None:
                    n_real = jnp.sum(graph.edge_mask.astype(jnp.int32))
                    ptr = jnp.minimum(ptr, n_real)
                deg = (ptr[1:] - ptr[:-1]).astype(jnp.float32)
            elif bucket_fast:
                # dense per-bucket reductions: no gather/scatter at all.
                # (bucketed.fused_raw_bank — variadic reduce + custom VJP —
                # measured *slower* than XLA autodiff of these dense
                # reductions on v5e: 27.6ms vs 25.6ms per ZINC-1024 step,
                # so the plain bank stays the default.)
                if all(a in bucketed.MOMENT_DERIVABLE
                       for a in self.aggregators):
                    # unstacked moment path: each aggregator is derived
                    # elementwise and contracted immediately — the stacked
                    # Z [N, A, T*Ft] (whose relayouts dominated the step's
                    # copy traffic, benchmarks/byte_audit.py) never exists
                    moments = bucketed.moment_stats(msg.reshape(E, T * Ft),
                                                    graph.bucket_spec,
                                                    in_deg=graph.in_deg)
                else:
                    Z = bucketed.raw_bank(msg.reshape(E, T * Ft),
                                          graph.bucket_spec,
                                          tuple(self.aggregators),
                                          in_deg=graph.in_deg)  # [N, A, T*Ft]
                deg = (graph.in_deg if graph.in_deg is not None
                       else jnp.asarray(bucketed.degrees(graph.bucket_spec)))
            else:
                bank = fused_vjp.make_raw_bank(graph.receivers,
                                               graph.edge_mask)
                Z = bank(msg.reshape(E, T * Ft).astype(cdt),
                         graph.nbr_edge_ids, graph.nbr_mask,
                         tuple(self.aggregators))               # [N, A, T*Ft]
                deg = jnp.sum(graph.nbr_mask, axis=1).astype(jnp.float32)
            w = fused_vjp._scaler_weights(list(self.scalers), deg,
                                          dict(self.avg_d))     # [S, N]

            # ---- posttrans with the scaler axis folded into the output ----
            kp, bp = post_ks[0], post_bs[0]
            # rows of kp per tower: [0:Ft] = h part; Ft + s*A*Ft + a*Ft + f
            k_h = kp[:, :Ft]                                   # [T, Ft, Fo]
            k_agg = kp[:, Ft:].reshape(T, S, A, Ft, post_dims[1])
            if self.divide_input:
                out = ein(hb.reshape(N, T, Ft), k_h)
            else:
                out = ein_shared(hb, k_h)
            # Z . K first (no scaler axis in the data), scalers on the
            # output: one [N, A*T*Ft] x [A*T*Ft, T*O*S] matmul whose weight
            # matches Z's natural (a, t, f) layout (t block-matched)
            Fo1 = post_dims[1]
            if moments is not None:
                # unstacked: y = sum_a derive(a) . K_a — four narrow
                # [N, T*Ft] x [T*Ft, T*O*S] matmuls instead of one wide
                # stacked contraction; the moment->aggregator derivations
                # are elementwise and fuse into the matmul inputs
                s_m, sq_m, mx_m, mn_m, cnt1_m, d0_m = moments
                eye = jnp.eye(T, dtype=cdt)
                y = None
                for i, a in enumerate(self.aggregators):
                    Za = bucketed.derive_aggregator(a, s_m, sq_m, mx_m,
                                                    mn_m, cnt1_m, d0_m)
                    ka = k_agg[:, :, i]                 # [T, S, Ft, Fo1]
                    if self.tp_axis is not None:
                        ya = jnp.einsum('ntf,tsfo->ntos',
                                        Za.reshape(N, T, Ft).astype(cdt),
                                        ka.astype(cdt),
                                        preferred_element_type=jnp.float32)
                        from jax.sharding import PartitionSpec
                        ya = jax.lax.with_sharding_constraint(
                            ya, PartitionSpec(None, self.tp_axis, None,
                                              None))
                    else:
                        Wa = jnp.einsum('tsfo,tu->tfuos', ka.astype(cdt),
                                        eye)
                        Wa = Wa.reshape(T * Ft, T * Fo1 * S)
                        ya = jnp.einsum('nk,ko->no', Za.astype(cdt), Wa,
                                        preferred_element_type=jnp.float32)
                        ya = ya.reshape(N, T, Fo1, S)
                    y = ya if y is None else y + ya
            elif self.tp_axis is not None:
                # per-tower contraction, tower axis sharded over the TP axis
                y = jnp.einsum('natf,tsafo->ntos',
                               Z.reshape(N, A, T, Ft).astype(cdt),
                               k_agg.astype(cdt),
                               preferred_element_type=jnp.float32)
                from jax.sharding import PartitionSpec
                y = jax.lax.with_sharding_constraint(
                    y, PartitionSpec(None, self.tp_axis, None, None))
            else:
                eye = jnp.eye(T, dtype=cdt)
                W = jnp.einsum('tsafo,tu->atfuos', k_agg.astype(cdt), eye)
                W = W.reshape(A * T * Ft, T * Fo1 * S)
                y = jnp.einsum('nk,ko->no',
                               Z.reshape(N, A * T * Ft).astype(cdt),
                               W, preferred_element_type=jnp.float32)
                y = y.reshape(N, T, Fo1, S)                     # [N,T,O,S]
            # store y [N, T, O, S] in the compute dtype before the scaler
            # contraction: in bf16 mode this halves the widest posttrans
            # intermediate's traffic (the f32 accumulate already happened
            # inside the matmuls; the scaler weighting re-accumulates in f32)
            out = out + jnp.einsum('ntos,sn->nto', y.astype(cdt),
                                   w.astype(cdt),
                                   preferred_element_type=jnp.float32) + bp
        else:
            # generic path: materialized aggregator x scaler bank
            self_msg = None
            if 'identity' in self.aggregators:
                hs = hb.reshape(N, T, Ft) if self.divide_input else hb
                if self.divide_input:
                    sm = ein(hs, k_src) + ein(hs, k_dst)
                else:
                    sm = ein_shared(hs, k_src) + ein_shared(hs, k_dst)
                sm = sm + b0
                for i in range(1, self.pretrans_layers):
                    sm = ein(jax.nn.relu(sm), pre_ks[i]) + pre_bs[i]
                self_msg = sm.reshape(N, T * Ft)
            agg = aggregate_bank(graph, msg.reshape(E, T * Ft),
                                 list(self.aggregators), list(self.scalers),
                                 self.avg_d, self_msg=self_msg)  # [N,S*A*T*Ft]
            kp, bp = post_ks[0], post_bs[0]
            k_h = kp[:, :Ft]
            # rows Ft + (s*A + a)*Ft + f of tower t <- col ((s*A+a)*T + t)*Ft + f
            k_agg = kp[:, Ft:].reshape(T, S * A, Ft, post_dims[1])
            if self.divide_input:
                out = jnp.einsum('ntf,tfo->nto', hb.reshape(N, T, Ft)
                                 .astype(cdt), k_h.astype(cdt),
                                 preferred_element_type=jnp.float32)
            else:
                out = ein_shared(hb, k_h)
            out = out + jnp.einsum('nxtf,txfo->nto',
                                   agg.reshape(N, S * A, T, Ft).astype(cdt),
                                   k_agg.astype(cdt),
                                   preferred_element_type=jnp.float32) + bp

        for i in range(1, self.posttrans_layers):
            out = ein(jax.nn.relu(out), post_ks[i]) + post_bs[i]
        out = out.reshape(N, T * Fo).astype(jnp.float32)

        if self.graph_norm:
            out = out * graph.snorm_n
        if self.batch_norm:
            # per-tower BN channels are disjoint -> one BN over T*Fo channels
            out = MaskedBatchNorm(name='batchnorm_h',
                                  axis_name=self.bn_axis_name)(
                out, graph.node_mask, train)
        if self.dropout:
            out = nn.Dropout(rate=self.dropout, deterministic=not train)(out)

        out = nn.Dense(self.out_dim, use_bias=True,
                       kernel_init=xavier_uniform_gain(1.0 / self.out_dim),
                       bias_init=nn.initializers.zeros, name='mixing')(out)
        out = jax.nn.leaky_relu(out, negative_slope=0.01)
        if residual:
            out = h_in + out
        return out
