"""Join profiler op durations with HLO source metadata -> cost per source line."""
import glob, gzip, json, re, sys
from collections import defaultdict

trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/kicp_trace"
hlo_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/runner_hlo.txt"
nframes = float(sys.argv[3]) if len(sys.argv) > 3 else 50.0

# op name -> (file, line) from HLO text
src = {}
pat = re.compile(r"%(\S+) = .*?source_file=\"([^\"]+)\" source_line=(\d+)")
for line in open(hlo_path):
    m = pat.search(line)
    if m:
        src[m.group(1)] = (m.group(2).split("/")[-1], int(m.group(3)))

files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
with gzip.open(files[0], "rt") as f:
    trace = json.load(f)
events = trace["traceEvents"]
pid_names = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_names[e["pid"]] = e["args"].get("name", "")
dev_pids = {p for p, n in pid_names.items() if "TPU" in n}

tot = defaultdict(float); cnt = defaultdict(int); unknown = defaultdict(float)
for e in events:
    if e.get("ph") == "X" and e.get("pid") in dev_pids:
        name = e["name"]
        if name.startswith(("jit_", "while.4", "cond.")) and name in ("while.43",):
            continue
        key = src.get(name)
        if key is None:
            # try args.long_name etc
            unknown[name] += e.get("dur", 0)
        else:
            tot[key] += e.get("dur", 0); cnt[key] += 1

print(f"{'source':48s} {'us/frame':>9s} {'count':>6s}")
for key, us in sorted(tot.items(), key=lambda kv: -kv[1])[:35]:
    print(f"{key[0]+':'+str(key[1]):48s} {us/nframes:9.1f} {cnt[key]:6d}")
print("\n-- unattributed (top) --")
for name, us in sorted(unknown.items(), key=lambda kv: -kv[1])[:15]:
    print(f"{name:48s} {us/nframes:9.1f}")
