"""Op-level TPU trace for one fused-scan train window.

Usage: python scripts/trace_ops.py VARIANT [top_n]

Captures a jax.profiler trace of one 32-step scan window for a
profile_variants.py registry entry and prints the top HLO ops by device
self-time (parsed from the xplane via xprof), i.e. where the step actually
goes — gathers vs matmuls vs elementwise — rather than subtraction guesses.
"""
import glob
import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(__file__))

import jax

from dyglib_tpu.utils import enable_compilation_cache, use_fast_prng

enable_compilation_cache()
use_fast_prng()

import jax.numpy as jnp

_ARGS = sys.argv[1:]
sys.argv = sys.argv[:1]  # keep profile_variants' own CLI loop from firing
import profile_variants as pv  # reuses the registry + data setup


def main():
    name = _ARGS[0]
    top_n = int(_ARGS[1]) if len(_ARGS) > 1 else 30
    if os.path.isdir(name):  # parse an existing trace dir, no re-capture
        _parse_dir(name, top_n)
        return
    make = pv.VARIANTS[name]

    tr = pv.LinkPredictionTrainer(
        make(), pv.data, pv.TrainConfig(batch_size=pv.B),
        os.path.join(pv.root, "ck.pkl"),
    )
    params, opt_state = tr.init_params(0)
    state = tr.init_state()
    n_scan = 32
    train = pv.train

    def batch_at(s):
        s = s % (train.num_interactions - pv.B)
        sl = slice(s, s + pv.B)
        return (
            jnp.asarray(train.src[sl], jnp.int32),
            jnp.asarray(train.dst[sl], jnp.int32),
            jnp.asarray(train.src[sl], jnp.int32),
            jnp.asarray(train.dst[::-1][sl], jnp.int32),
            jnp.asarray(pv.keys_all[sl], jnp.int32),
            jnp.asarray(train.eid[sl], jnp.int32),
            jnp.ones((pv.B,), jnp.float32),
        )

    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[batch_at(i * pv.B) for i in range(n_scan)]
    )
    keys = jax.vmap(
        lambda i: jax.random.fold_in(jax.random.PRNGKey(0), i)
    )(jnp.arange(n_scan))

    out = (params, opt_state, state)
    for i in range(2):  # compile + donation-layout respecialization
        print(f"warmup {i}...", flush=True)
        res = tr.train_epoch_scan_fn(*out, tr.train_csr, stacked, keys)
        jax.block_until_ready(res[3])
        out = res[:3]

    logdir = tempfile.mkdtemp(prefix=f"trace_{name}_")
    print("tracing...", flush=True)
    with jax.profiler.trace(logdir):
        res = tr.train_epoch_scan_fn(*out, tr.train_csr, stacked, keys)
        jax.block_until_ready(res[3])
    print("trace captured", flush=True)

    print(f"trace dir: {logdir}")
    _parse_dir(logdir, top_n, n_scan)


def _parse_dir(logdir, top_n, n_scan=32):
    """TRACE_TOOL=hlo_stats gives INSTRUCTION-level rows (full fusion
    names with producers/consumers) instead of the default aggregated
    framework_op_stats; TRACE_FILTER=layout keeps only data-movement ops
    (reshape/transpose/copy/convert/slice/concatenate) — the VERDICT r4
    #6 "name the flagship's layout 1.2 ms" instrument."""
    xplanes = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                        recursive=True)
    assert xplanes, f"no xplane under {logdir}"
    from xprof.convert import raw_to_tool_data as rtd

    tool = os.environ.get("TRACE_TOOL", "framework_op_stats")
    data, _ = rtd.xspace_to_tool_data([xplanes[0]], tool, {})
    import gzip
    import json

    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode()
    rows = json.loads(data)
    _dump_op_stats(rows, top_n, n_scan)


def _dump_op_stats(rows, top_n, n_scan):
    """rows: gviz-style table json from framework_op_stats."""
    if isinstance(rows, list):  # [tbl, ...] wrapper variants
        rows = rows[0]
    cols = [c["label"] if isinstance(c, dict) else c for c in rows["cols"]]
    recs = []
    for r in rows["rows"]:
        vals = [c.get("v") if isinstance(c, dict) else c for c in r["c"]]
        recs.append(dict(zip(cols, vals)))
    def find(*names):
        for k in names:
            if k in cols:
                return k
        return None

    key_time = find("Total self-time (us)", "total_self_time_us",
                    "Total self time (us)")
    name_key = find("Operation Name", "Operation", "Op name",
                    "Framework op name")
    if key_time is None or name_key is None:
        print("columns:", cols)
        print(recs[:3])
        return
    type_key = find("Operation Type", "Type", "Category",
                    "HLO op category")
    host_key = find("Host/device", "Host or device", "host_or_device")
    bound_key = find("Bound by")
    bw_key = find("Measured memory BW (GiB/s)")
    shape_key = find("HLO op text")
    dev = [
        r for r in recs
        if host_key is None or "host" not in str(r.get(host_key, "")).lower()
    ]
    if os.environ.get("TRACE_FILTER") == "layout":
        layout_kinds = ("reshape", "transpose", "copy", "convert", "slice",
                        "concatenate", "pad", "bitcast")
        def is_layout(r):
            t = str(r.get(type_key, "")).lower()
            n = str(r.get(name_key, "")).lower()
            return any(k in t for k in layout_kinds) or (
                not t and any(k in n for k in layout_kinds)
            )
        dev = [r for r in dev if is_layout(r)]
    dev.sort(key=lambda r: -float(r[key_time]))
    tot = sum(float(r[key_time]) for r in dev)
    print(f"device total self-time: {tot/1e3:.2f} ms "
          f"({tot/1e3/n_scan:.3f} ms/step)")
    print(f"{'us/step':>9}  {'%':>5}  op")
    for r in dev[:top_n]:
        t = float(r[key_time])
        label = r[name_key]
        if type_key:
            label = f"[{r[type_key]}] {label}"
        extra = ""
        if bound_key and r.get(bound_key):
            extra = f"  [{r[bound_key]} @ {float(r.get(bw_key) or 0):.0f} GiB/s]"
        print(f"{t/n_scan:9.1f}  {100*t/tot:5.1f}  {label[:100]}{extra}")
        if shape_key and os.environ.get("TRACE_SHAPES") == "1":
            txt = str(r.get(shape_key, ""))
            print(f"{'':>18}{txt.split(' fusion(')[0][:140]}")


if __name__ == "__main__":
    main()
