"""Batch command line: run SAFE over a whole attribute matrix in one program.

Reference analog: ``python safe.py <attribute_file>`` (safepy/safe.py:1321-1361),
which column-chunks the attribute matrix over a multiprocessing pool where EVERY
worker redundantly reloads the network and recomputes the neighborhoods
(safe.py:1309-1314). Here the network is loaded and the APSP computed exactly once,
and the whole attribute matrix flows through the device pipeline in one pass — the
device batches internally, and multi-chip runs shard the attribute columns instead
of forking processes.

Usage::

    python -m safepy_tpu.cli path/to/attributes.txt [--ini config.ini]
                                                    [--output out.p]
"""

from __future__ import annotations

import argparse
import logging
import pickle
import time


def parse_mesh(spec: str):
    """--mesh spec -> jax.sharding.Mesh.

    'auto' puts every device on an 'attr' axis (column-sharded enrichment, the
    reference CLI's parallelism); 'data=2,attr=4' builds the named 2-axis mesh.
    """
    from safepy_tpu.parallel import make_mesh

    if spec == "auto":
        import jax
        return make_mesh({"attr": len(jax.devices())})
    axes = {}
    for part in spec.split(","):
        name, _, size = part.partition("=")
        axes[name.strip()] = int(size)
    return make_mesh(axes)


def run_safe_batch(path_to_attribute_file: str, path_to_ini_file: str = "",
                   num_permutations: int = 1000, mesh=None):
    """Full pipeline over the complete attribute matrix; returns the NES matrix."""
    from safepy_tpu.safe import SAFE

    sf = SAFE(path_to_ini_file=path_to_ini_file)
    sf.mesh = mesh
    sf.load_network()
    sf.define_neighborhoods()
    sf.load_attributes(attribute_file=path_to_attribute_file)
    sf.compute_pvalues(num_permutations=num_permutations)
    return sf.nes


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="Run Spatial Analysis of Functional Enrichment (SAFE) on the "
                    "configured network")
    parser.add_argument("path_to_attribute_file", type=str,
                        help="Path to the file containing label-to-attribute "
                             "annotations")
    parser.add_argument("--ini", type=str, default="",
                        help="Path to a SAFE INI configuration file")
    parser.add_argument("--num-permutations", type=int, default=1000)
    parser.add_argument("--mesh", type=str, default=None,
                        help="Multi-chip mesh: 'auto' (all devices on an 'attr' "
                             "axis) or explicit axes like 'data=2,attr=4'; "
                             "axes named 'attr'/'perm'/'data' shard attribute "
                             "columns, permutation batches, and APSP rows")
    parser.add_argument("--output", type=str, default=None,
                        help="Output pickle path (default: "
                             "<attribute_file>_safe_nes.p)")
    args = parser.parse_args(argv)

    start = time.time()
    mesh = parse_mesh(args.mesh) if args.mesh else None
    nes = run_safe_batch(args.path_to_attribute_file, args.ini,
                         args.num_permutations, mesh=mesh)

    output_file = args.output or ("%s_safe_nes.p" % args.path_to_attribute_file)
    logging.info("Saving the results...")
    with open(output_file, "wb") as handle:
        pickle.dump(nes, handle)
    logging.info("Done in %.1f s -> %s" % (time.time() - start, output_file))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
