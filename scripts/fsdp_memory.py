"""Executable FSDP memory accounting: eval_shape the params + optimizer
state of a GPT-2 family config through partition.TRANSFORMER_RULES and
report PER-DEVICE bytes for a given (data, fsdp, tensor) mesh shape —
no hardware (and no allocation) required.

This makes docs/BENCH.md's "--mesh 1,N,1 divides the gpt2-xl state
across chips" claim a CHECKED number: the reference evaluates gpt2-xl
(/root/reference/lms/src/eval_ppl_with_pretrained_lm.py:199-205), and
training it needs the state split to fit 16 GB v5e chips.

Usage:
    python scripts/fsdp_memory.py --model gpt2-xl --mesh 1,8,1 \
        --optimizer adamw --budget_gb 16

Exit code 1 if the per-device total exceeds the budget.
"""

from __future__ import annotations

import argparse
import sys
from functools import partial

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _path_str(key_path) -> str:
    """jax KeyPath -> 'a.b.c' string usable by partition rule regexes."""
    parts = []
    for k in key_path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "name"):
            parts.append(str(k.name))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return ".".join(parts)


def shard_factor(path: str, shape, mesh_shape: dict, rules) -> int:
    """Number of ways the leaf is split across the mesh: the product of
    mesh-axis sizes in its VALIDATED PartitionSpec (the exact same
    validation shard_params applies — indivisible dims drop or relocate
    their axes, partition.validate_spec)."""
    from loco_asr_tpu.parallel.partition import spec_for, validate_spec

    spec = validate_spec(spec_for(path, rules), tuple(shape), mesh_shape,
                         path=path)
    factor = 1
    for s in spec:
        if s is None:
            continue
        names = s if isinstance(s, tuple) else (s,)
        factor *= int(np.prod([mesh_shape.get(n, 1) for n in names]))
    return factor


def memory_report(cfg, mesh_shape: dict, optimizer: str = "adamw",
                  mu_dtype=None, rules=None):
    """Returns {params_bytes, opt_bytes, total_bytes, per_device_bytes,
    replicated_bytes, n_params} for the config under the mesh shape.

    Everything is computed from jax.eval_shape — nothing is allocated, so
    gpt2-xl accounting runs in milliseconds on any host."""
    import jax

    from loco_asr_tpu.models.gpt2 import model as g
    from loco_asr_tpu.parallel import partition, train

    rules = rules or partition.TRANSFORMER_RULES
    abstract = jax.eval_shape(partial(g.gpt2_init, cfg=cfg),
                              jax.random.PRNGKey(0))
    if optimizer == "adafactor":
        tx = train.adafactor(1e-3)
    else:
        tx = train.adamw(1e-4, mu_dtype=mu_dtype)
    opt_abstract = jax.eval_shape(tx.init, abstract)

    def accumulate(tree):
        total = per_dev = replicated = n = 0
        for key_path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            if not hasattr(leaf, "shape"):
                continue
            path = _path_str(key_path)
            nbytes = int(np.prod(leaf.shape, dtype=np.int64)) * \
                np.dtype(leaf.dtype).itemsize
            f = shard_factor(path, leaf.shape, mesh_shape, rules)
            total += nbytes
            per_dev += nbytes // f
            if f == 1:
                replicated += nbytes
            n += int(np.prod(leaf.shape, dtype=np.int64))
        return total, per_dev, replicated, n

    p_total, p_dev, p_repl, n_params = accumulate(abstract)
    o_total, o_dev, o_repl, _ = accumulate(opt_abstract)
    return {
        "params_bytes": p_total, "opt_bytes": o_total,
        "total_bytes": p_total + o_total,
        "per_device_bytes": p_dev + o_dev,
        "replicated_bytes": p_repl + o_repl,
        "n_params": n_params,
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--model", default="gpt2-xl",
                   choices=["tiny", "gpt2", "gpt2-medium", "gpt2-large",
                            "gpt2-xl"])
    p.add_argument("--mesh", default="1,8,1",
                   help="data,fsdp,tensor sizes (memory accounting only — "
                        "no devices are created)")
    p.add_argument("--optimizer", choices=["adamw", "adafactor"],
                   default="adamw")
    p.add_argument("--opt_mu_dtype", choices=["float32", "bfloat16"],
                   default="float32")
    p.add_argument("--budget_gb", type=float, default=16.0,
                   help="per-device HBM budget (v5e = 16 GB); exit 1 if "
                        "exceeded")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from loco_asr_tpu.models.gpt2 import model as g

    cfg = (g.tiny_gpt2_config() if args.model == "tiny"
           else g.PRESETS[args.model])
    data, fsdp, tensor = (int(x) for x in args.mesh.split(","))
    mesh_shape = {"data": data, "fsdp": fsdp, "tensor": tensor}
    rep = memory_report(cfg, mesh_shape, args.optimizer,
                        mu_dtype=(jnp.bfloat16
                                  if args.opt_mu_dtype == "bfloat16"
                                  else None))
    gb = 1024 ** 3
    print(f"{args.model}: {rep['n_params']/1e6:.1f}M params, "
          f"optimizer={args.optimizer}")
    print(f"  params          {rep['params_bytes']/gb:8.2f} GiB")
    print(f"  optimizer state {rep['opt_bytes']/gb:8.2f} GiB")
    print(f"  total           {rep['total_bytes']/gb:8.2f} GiB")
    print(f"  mesh (data={data}, fsdp={fsdp}, tensor={tensor}):")
    print(f"  per-device      {rep['per_device_bytes']/gb:8.2f} GiB "
          f"(replicated residue {rep['replicated_bytes']/gb:.3f} GiB)")
    ok = rep["per_device_bytes"] <= args.budget_gb * gb
    print(f"  budget {args.budget_gb:.1f} GiB/device: "
          f"{'OK' if ok else 'EXCEEDED'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
