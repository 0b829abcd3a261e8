#!/bin/bash
# Dump formatted physical plans for the given queries into plans/<tag>/,
# one <query>_<suffix>.txt per query (the round's before/after evidence).
# Usage: scripts/dump_plans.sh <tag> <suffix> <sfDir> <query> [query...]
set -e
tag=$1; suffix=$2; sfdir=$3; shift 3
mkdir -p "plans/$tag"
raw=$(mktemp)
sbt -batch "runMain graft.tools.Explain $sfdir $*" 2>/dev/null |
  sed -n 's/^\[info\] //p' > "$raw"
python3 - "$raw" "$tag" "$suffix" <<'EOF'
import sys, re
raw, tag, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
cur, buf = None, []
def flush():
    if cur and buf:
        open(f"plans/{tag}/{cur}_{suffix}.txt", "w").write("\n".join(buf).strip() + "\n")
for line in open(raw).read().splitlines():
    m = re.match(r"^=+ (\S+) =+$", line.strip())
    if m:
        flush(); cur, buf = m.group(1), []
    elif cur is not None:
        buf.append(line)
flush()
EOF
rm -f "$raw"
ls "plans/$tag" | grep "_$suffix" | head -40
