"""Graph neural nets for CME analytics: GCN encoder + DeepGraphInfomax, in flax.

Replaces the reference's torch_geometric stack (reference:
wsinsight/insightlib/cme_generation.py:498-643: 2-layer GCNConv encoder with
PReLU, DGI with bilinear discriminator and row-shuffle corruption, Adam,
epochs=300, multi-GPU via PyG DataParallel). TPU-native design:

* graphs are padded to static (max_nodes, max_edges) so one jitted train step
  serves every graph,
* message passing is `segment_sum` over edge arrays (no sparse formats needed),
* data parallelism is a 1-D mesh over the *graph batch* axis with gradient
  psum — the jit-sharding equivalent of the reference's DataParallel.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclass
class PaddedGraph:
    """One graph padded to static shapes.

    x: (max_nodes, F); edges: (2, max_edges) int32 (src, dst) with padding
    edges pointing at node max_nodes-1 padded slot masked out by edge_mask.
    """

    x: np.ndarray
    edges: np.ndarray
    node_mask: np.ndarray  # (max_nodes,) float32 1=real (participates in propagation)
    edge_mask: np.ndarray  # (max_edges,) float32 1=real
    loss_mask: np.ndarray | None = None  # (max_nodes,) 1=contributes to the DGI loss


def pad_graph(
    x: np.ndarray, edge_index: np.ndarray, max_nodes: int, max_edges: int
) -> PaddedGraph:
    n, f = x.shape
    e = edge_index.shape[1]
    if n > max_nodes or e > max_edges:
        raise ValueError(f"graph ({n} nodes, {e} edges) exceeds padding ({max_nodes}, {max_edges})")
    xp = np.zeros((max_nodes, f), np.float32)
    xp[:n] = x
    ep = np.zeros((2, max_edges), np.int32)
    ep[:, :e] = edge_index
    ep[:, e:] = max_nodes - 1 if n < max_nodes else 0  # park padding on last slot
    nm = np.zeros(max_nodes, np.float32)
    nm[:n] = 1.0
    em = np.zeros(max_edges, np.float32)
    em[:e] = 1.0
    return PaddedGraph(x=xp, edges=ep, node_mask=nm, edge_mask=em, loss_mask=nm.copy())


def _gcn_propagate(
    h: jax.Array, edges: jax.Array, edge_mask: jax.Array, node_mask: jax.Array
) -> jax.Array:
    """Symmetric-normalized propagation with self loops: D^-1/2 (A+I) D^-1/2 h.

    Matches torch_geometric GCNConv's default normalization.
    """
    n = h.shape[0]
    src, dst = edges[0], edges[1]
    deg = jnp.zeros(n, jnp.float32).at[dst].add(edge_mask)
    deg = deg + node_mask  # self loop counts
    dinv = jnp.where(deg > 0, jax.lax.rsqrt(deg), 0.0)
    coeff = dinv[src] * dinv[dst] * edge_mask
    msgs = h[src] * coeff[:, None]
    agg = jnp.zeros_like(h).at[dst].add(msgs)
    agg = agg + h * (dinv * dinv * node_mask)[:, None]  # self loops
    return agg


class GCNConv(nn.Module):
    """torch_geometric-style GCNConv (eval math) on padded edge arrays."""

    features: int

    @nn.compact
    def __call__(self, h, edges, edge_mask, node_mask):
        h = nn.Dense(self.features, use_bias=True, name="lin")(h)
        return _gcn_propagate(h, edges, edge_mask, node_mask)


class GCNEncoder(nn.Module):
    """2-layer GCN with PReLU activations (reference: cme_generation.py:498-530)."""

    hidden: int = 64
    out_dim: int = 32

    @nn.compact
    def __call__(self, x, edges, edge_mask, node_mask):
        h = GCNConv(self.hidden, name="conv1")(x, edges, edge_mask, node_mask)
        a1 = self.param("prelu1", nn.initializers.constant(0.25), (1,))
        h = jnp.where(h > 0, h, a1 * h)
        h = GCNConv(self.out_dim, name="conv2")(h, edges, edge_mask, node_mask)
        a2 = self.param("prelu2", nn.initializers.constant(0.25), (1,))
        h = jnp.where(h > 0, h, a2 * h)
        return h


class DGI(nn.Module):
    """DeepGraphInfomax: encoder + bilinear discriminator vs row-shuffle
    corruption (reference: cme_generation.py:531-552)."""

    hidden: int = 64
    out_dim: int = 32

    def setup(self):
        self.encoder = GCNEncoder(self.hidden, self.out_dim)
        self.weight = self.param(
            "weight", nn.initializers.uniform(scale=1.0), (self.out_dim, self.out_dim)
        )

    def embed(self, x, edges, edge_mask, node_mask):
        return self.encoder(x, edges, edge_mask, node_mask)

    def __call__(self, x, x_corrupt, edges, edge_mask, node_mask, loss_mask=None):
        # node_mask gates propagation (real vs padding); loss_mask restricts
        # the objective — e.g. to interior nodes of a halo-aware subgraph
        # whose receptive fields are complete (sample_subgraph).
        lm = node_mask if loss_mask is None else loss_mask
        pos = self.encoder(x, edges, edge_mask, node_mask)
        neg = self.encoder(x_corrupt, edges, edge_mask, node_mask)
        n_real = jnp.maximum(lm.sum(), 1.0)
        summary = jax.nn.sigmoid((pos * lm[:, None]).sum(0) / n_real)

        def scores(h):
            return jnp.einsum("nd,de,e->n", h, self.weight, summary)

        # Stable BCE-with-logits: -log(sigmoid(s)) = softplus(-s),
        # -log(1 - sigmoid(s)) = softplus(s). (The naive log(1-sigmoid+eps)
        # form overflows to inf under XLA fusion for large scores.)
        pos_loss = jax.nn.softplus(-scores(pos))
        neg_loss = jax.nn.softplus(scores(neg))
        loss = ((pos_loss + neg_loss) * lm).sum() / n_real
        return loss


def sample_subgraph(
    x: np.ndarray,
    edge_index: np.ndarray,
    max_nodes: int,
    max_edges: int,
    rng: np.random.Generator,
) -> PaddedGraph:
    """Halo-aware LOCAL subgraph padded to static shapes.

    Keeps DGI training memory bounded for million-cell slide graphs while
    preserving neighbourhood structure: grow a BFS ball from a random seed
    (adding further random seeds if a component runs out) until the node
    budget is filled, keep the edges among the selected nodes, and mask the
    DGI loss to the INTERIOR nodes — those whose full 1-hop neighbourhood
    made it into the sample — so boundary-clipped receptive fields never
    contribute gradient. (A uniform random node subset of a sparse spatial
    graph keeps almost no edges at all; BFS balls are the shape the encoder
    actually sees at inference.)
    """
    n = x.shape[0]
    src, dst = edge_index
    take = min(max_nodes - 1, n)

    if take >= n:
        selected = np.arange(n)
    else:
        # CSR adjacency for BFS
        order = np.argsort(src, kind="stable")
        s_sorted, d_sorted = src[order], dst[order]
        starts = np.searchsorted(s_sorted, np.arange(n + 1))
        chosen = np.zeros(n, bool)
        picked: list[np.ndarray] = []
        count = 0
        while count < take:
            free = np.flatnonzero(~chosen)
            frontier = np.array([rng.choice(free)])
            chosen[frontier] = True
            picked.append(frontier)
            count += 1
            while frontier.size and count < take:
                neigh = np.concatenate(
                    [d_sorted[starts[v] : starts[v + 1]] for v in frontier]
                )
                neigh = np.unique(neigh)
                neigh = neigh[~chosen[neigh]]
                if neigh.size > take - count:
                    neigh = rng.choice(neigh, size=take - count, replace=False)
                if neigh.size == 0:
                    break
                chosen[neigh] = True
                picked.append(neigh)
                count += neigh.size
                frontier = neigh
        selected = np.concatenate(picked)

    remap = -np.ones(n, np.int64)
    remap[selected] = np.arange(len(selected))
    keep = (remap[src] >= 0) & (remap[dst] >= 0)
    sub_edges = np.stack([remap[src[keep]], remap[dst[keep]]])
    truncated_local = np.empty(0, np.int64)
    if sub_edges.shape[1] > max_edges:
        sel = rng.choice(sub_edges.shape[1], size=max_edges, replace=False)
        dropped = np.ones(sub_edges.shape[1], bool)
        dropped[sel] = False
        # endpoints of subsampled-out edges also have clipped receptive
        # fields — exclude them from the loss like boundary nodes
        truncated_local = np.unique(sub_edges[:, dropped])
        sub_edges = sub_edges[:, sel]

    # interior = selected nodes with no lost neighbours (full receptive field)
    lost = np.zeros(n, np.int64)
    cut = (remap[src] >= 0) & (remap[dst] < 0)
    np.add.at(lost, src[cut], 1)
    interior = lost[selected] == 0
    if truncated_local.size:
        interior[truncated_local] = False

    g = pad_graph(x[selected], sub_edges, max_nodes, max_edges)
    lm = np.zeros_like(g.node_mask)
    lm[: len(selected)] = interior.astype(np.float32)
    if not lm.any():  # degenerate sample: learn from everything rather than nothing
        lm[: len(selected)] = 1.0
    return PaddedGraph(
        x=g.x, edges=g.edges, node_mask=g.node_mask, edge_mask=g.edge_mask, loss_mask=lm
    )


def embed_full_graph(params: dict, x: np.ndarray, edge_index: np.ndarray) -> np.ndarray:
    """Exact full-graph GCN embedding on host sparse algebra (any graph size).

    Mirrors GCNEncoder's math: two GCNConv layers (symmetric-normalized
    propagation with self loops) with PReLU, using the trained params. Used
    after subgraph-sampled training so embeddings stay exact.
    """
    from scipy import sparse

    n = x.shape[0]
    src, dst = edge_index
    data = np.ones(len(src), np.float32)
    a = sparse.coo_matrix((data, (dst, src)), shape=(n, n)).tocsr()
    a.data[:] = 1.0
    deg = np.asarray(a.sum(axis=1)).ravel() + 1.0  # self loops
    dinv = 1.0 / np.sqrt(deg)

    def propagate(h: np.ndarray) -> np.ndarray:
        scaled = h * dinv[:, None]
        agg = a @ scaled
        agg = (agg + scaled) * dinv[:, None]
        return agg

    enc = params["encoder"]

    def gcn(h, conv_params):
        lin = conv_params["lin"]
        h = h @ np.asarray(lin["kernel"]) + np.asarray(lin["bias"])
        return propagate(h)

    h = gcn(x.astype(np.float32), enc["conv1"])
    a1 = float(np.asarray(enc["prelu1"])[0])
    h = np.where(h > 0, h, a1 * h)
    h = gcn(h, enc["conv2"])
    a2 = float(np.asarray(enc["prelu2"])[0])
    return np.where(h > 0, h, a2 * h).astype(np.float32)


def make_dgi_train_step(model: DGI, optimizer, mesh=None):
    """Jitted DGI step over a *batch* of padded graphs, batch-sharded on mesh.

    Batch dims: x (B, N, F), edges (B, 2, E), masks (B, ...). Gradients are
    meaned over the batch (psum over the mesh under jit).
    """
    def loss_fn(params, x, x_corrupt, edges, edge_mask, node_mask, loss_mask):
        losses = jax.vmap(
            lambda a, b, c, d, e, f: model.apply({"params": params}, a, b, c, d, e, f)
        )(x, x_corrupt, edges, edge_mask, node_mask, loss_mask)
        return losses.mean()

    def train_step(
        params, opt_state, x, x_corrupt, edges, edge_mask, node_mask, loss_mask
    ):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, x, x_corrupt, edges, edge_mask, node_mask, loss_mask
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())
        bsh = NamedSharding(mesh, P("data"))
        return jax.jit(
            train_step,
            in_shardings=(rep, rep, bsh, bsh, bsh, bsh, bsh, bsh),
            out_shardings=(rep, rep, rep),
        )
    return jax.jit(train_step)
