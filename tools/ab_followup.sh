#!/bin/bash
# Follow-up A/B pass: wait for the current runner (pid $1) to exit, then
# re-run every stage that has no rc=0 record in the log yet — a stage
# retired on pre-fix code (e2e's KV-budget assert) gets its post-fix shot
# without re-measuring what already succeeded.
set -u
PID=${1:?usage: ab_followup.sh <runner_pid> <log.jsonl>}
LOG=${2:?}
while kill -0 "$PID" 2>/dev/null; do sleep 30; done
MISSING=$(python3 - "$LOG" <<'EOF'
import json, sys

sys.path.insert(0, "tools")
from ab_runner import STAGES

ok = set()
for line in open(sys.argv[1]):
    d = json.loads(line)
    if d.get("rc") == 0:
        ok.add(d["stage"])
names = [n for n, *_ in STAGES if n not in ok]
# e2e is the highest-value missing number (VERDICT r4 item 1c)
names.sort(key=lambda n: n != "e2e")
print(" ".join(names))
EOF
)
echo "follow-up stages: $MISSING"
[ -z "$MISSING" ] && exit 0
exec python tools/ab_runner.py --log "$LOG" --max_hours 1.5 --only $MISSING
