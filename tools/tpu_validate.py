"""TPU validation battery: run the framework's hardware-dependent paths on the
real chip and check them against host oracles.

Covers what the CPU-mesh test suite cannot: Pallas kernels under shard_map on a
real TPU mesh, z-score permutation nulls at Costanzo scale, and an 8k-node
end-to-end stress run. Usage: tools/tpu_run.sh tools/tpu_validate.py
"""
import time, numpy as np, pandas as pd
import safepy_tpu
import jax, jax.numpy as jnp

# 1. sharded FW with the Pallas inner kernels on a 1-device TPU mesh
from safepy_tpu.parallel import make_mesh, apsp_sharded
from safepy_tpu.ops.neighborhoods import dense_initial_distances
import networkx as nx
rng = np.random.default_rng(0)
g = nx.gnp_random_graph(300, 0.03, seed=1)
edges = np.array(g.edges()); w = rng.uniform(0.1, 2.0, len(edges))
d0 = dense_initial_distances(300, edges, w)
mesh = make_mesh({"data": 1})
t0=time.time()
got = np.asarray(apsp_sharded(d0, mesh, block=128, use_pallas=True))
import scipy.sparse as sp, scipy.sparse.csgraph as csg
want = csg.shortest_path(sp.coo_matrix((w,(edges[:,0],edges[:,1])),shape=(300,300)), directed=False)
err = np.abs(got[np.isfinite(want)]-want[np.isfinite(want)]).max()
print(f"sharded FW (pallas, 1-dev TPU mesh): {time.time()-t0:.1f}s err={err:.1e}", flush=True)
assert err < 1e-4, f"sharded FW diverged from the scipy oracle: {err}"

# 2. z-score permutation drive at Costanzo scale
from bench import build_network, N_NODES
g2, _ = build_network()
vals = rng.normal(size=(N_NODES, 3)); vals[rng.random((N_NODES,3))<0.3] = np.nan
attr = pd.DataFrame(vals, index=[f"gene{i}" for i in range(N_NODES)], columns=list("abc"))
from safepy_tpu import SAFE
sf = SAFE(verbose=False); sf.random_seed = 5
sf.load_network(network_file=g2, node_key_attribute="key")
sf.load_attributes(attribute_file=attr)
t0=time.time()
sf.run_pipeline(num_permutations=1000, neighborhood_score_type="z-score")
print(f"z-score 1000-perm x3 attrs compile+run: {time.time()-t0:.1f}s", flush=True)
t0=time.time()
sf.run_pipeline(num_permutations=1000, neighborhood_score_type="z-score")
print(f"z-score steady: {time.time()-t0:.1f}s enriched={int(sf.nes_binary.sum())}", flush=True)
assert np.nanmax(sf.pvalues_pos) <= 1.0

# 3. 8k-node end-to-end stress
N3 = 8000
g3, _c3 = build_network(n=N3, k=9, edge_budget=None, prefix="n")
vals3 = rng.normal(size=(N3,1))
attr3 = pd.DataFrame(vals3, index=[f"n{i}" for i in range(N3)], columns=["q"])
sf3 = SAFE(verbose=False); sf3.random_seed=6
sf3.load_network(network_file=g3, node_key_attribute="key")
sf3.load_attributes(attribute_file=attr3)
t0=time.time(); sf3.run_pipeline(num_permutations=1000)
print(f"8k-node e2e compile+run: {time.time()-t0:.1f}s", flush=True)
t0=time.time(); sf3.run_pipeline(num_permutations=1000)
print(f"8k-node e2e steady: {time.time()-t0:.1f}s enriched={int(sf3.nes_binary.sum())}", flush=True)
print("VALIDATION OK", flush=True)
