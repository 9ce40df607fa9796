"""Network layouts and layout-derived edge lengths.

Reference semantics (safepy/safe_io.py:288-333):

  * ``spring_embedded`` -> ``nx.spring_layout(G, k=0.2, iterations=100, seed=seed)``;
    ``kamada_kawai`` -> ``nx.kamada_kawai_layout(G)``. Coordinates land in the 'x'
    and 'y' node attributes. NetworkX stays the engine for these so that seeded
    layouts agree with the reference bit-for-bit.
  * ``spring_tpu`` (new) — the same Fruchterman-Reingold iteration scheme executed as
    dense JAX ops on the accelerator, for networks where the host layout becomes the
    bottleneck. Matches nx's dense implementation scheme (seeded uniform init,
    k=0.2, 100 iterations, linearly cooling temperature) but is NOT bit-identical.
  * edge lengths = Euclidean distance between endpoint layout coordinates, stored in
    the 'length' edge attribute (the weights used by shortpath_weighted_layout).
"""

from __future__ import annotations

import logging

import networkx as nx
import numpy as np


def apply_network_layout(G, layout: str = "kamada_kawai", seed=None, verbose: bool = True):
    """Compute node coordinates and store them as 'x'/'y' node attributes."""

    if layout == "kamada_kawai":
        if verbose:
            logging.info("Applying the Kamada-Kawai network layout... (may take several minutes)")
        pos = nx.kamada_kawai_layout(G)
    elif layout == "spring_embedded":
        if verbose:
            logging.info("Applying the spring-embedded network layout... (may take several minutes)")
        pos = nx.spring_layout(G, k=0.2, iterations=100, seed=seed)
    elif layout == "spring_tpu":
        if verbose:
            logging.info("Applying the TPU spring-embedded network layout...")
        pos = spring_layout_tpu(G, k=0.2, iterations=100, seed=seed)
    else:
        raise ValueError(f"unknown layout: {layout!r}")

    for n in G:
        G.nodes[n]["x"] = pos[n][0]
        G.nodes[n]["y"] = pos[n][1]

    return G


def spring_layout_tpu(G, k: float = 0.2, iterations: int = 100, seed=None):
    """Dense Fruchterman-Reingold force layout on the accelerator.

    Same scheme as networkx's dense path (repulsion k^2/d, attraction d^2/k on
    edges, linear cooling from 0.1 of the frame width over `iterations` steps) but
    vectorized as (N, N) JAX ops — O(iterations * N^2) on the VPU instead of Python.
    """
    import jax
    import jax.numpy as jnp

    nodes = list(G)
    n = len(nodes)
    index = {u: i for i, u in enumerate(nodes)}
    adj = np.zeros((n, n), np.float32)
    for u, v in G.edges():
        adj[index[u], index[v]] = 1.0
        adj[index[v], index[u]] = 1.0

    rng = np.random.default_rng(seed)
    pos0 = rng.uniform(0.0, 1.0, (n, 2)).astype(np.float32)

    t0 = 0.1
    dt = t0 / (iterations + 1)

    @jax.jit
    def run(pos, a):
        def body(i, pos):
            delta = pos[:, None, :] - pos[None, :, :]
            dist = jnp.sqrt(jnp.sum(delta * delta, axis=-1))
            dist = jnp.maximum(dist, 0.01)
            force = (k * k / (dist * dist)) - a * dist / k
            disp = jnp.sum(delta * force[..., None], axis=1)
            length = jnp.maximum(jnp.sqrt(jnp.sum(disp * disp, axis=-1)), 1e-9)
            t = t0 - i * dt
            return pos + disp / length[:, None] * jnp.minimum(length, t)[:, None]

        return jax.lax.fori_loop(0, iterations, body, pos)

    out = np.asarray(run(jnp.asarray(pos0), jnp.asarray(adj)))
    return {u: out[index[u]] for u in nodes}


def calculate_edge_lengths(G, verbose: bool = True):
    """Layout distance x edge weight -> 'length' edge attribute (f64 host math).

    The reference multiplies a dense N x N pdist by ``nx.adjacency_matrix`` —
    which carries the 'weight' edge attribute, 1 where absent — and keeps the
    non-NaN entries (safe_io.py:318-331). Endpoint-indexed math here is
    equivalent and O(E): length(u, v) = euclidean(u, v) * weight(u, v).
    """
    if verbose:
        logging.info("Calculating edge lengths...")

    xs = dict(G.nodes.data("x"))
    ys = dict(G.nodes.data("y"))
    lengths = {}
    for u, v, data in G.edges(data=True):
        dist = float(np.hypot(xs[u] - xs[v], ys[u] - ys[v]))
        lengths[(u, v)] = dist * float(data.get("weight", 1))
    nx.set_edge_attributes(G, lengths, "length")
    return G
