#!/usr/bin/env bash
# Repo-side leak scan with freshness evidence (ADVICE r10, item 4).
#
# The driver-written LEAKCHECK.json carries only a round counter, so a
# counter-only bump is indistinguishable from a stale scan. This script
# re-runs the same seven categories over the tracked tree and stamps the
# output with the scanned HEAD commit, the tracked-file count, and the
# scanned line count — evidence that the hits arrays correspond to THIS
# tree, not a previous one. Output: LEAKCHECK_LOCAL.json (committed).
#
# Patterns are written from the category names alone (the driver's exact
# regexes are not visible to the repo); each is a superset-style guard:
# a hit here is worth a manual look even if the driver's scan is clean.
set -euo pipefail
cd "$(dirname "$0")/.."

files=$(git ls-files '*.scala' '*.sbt' '*.md' '*.json' '*.py' '*.sh')
n_files=$(echo "$files" | wc -l)
n_lines=$(echo "$files" | xargs cat | wc -l)
head_sha=$(git rev-parse HEAD)

scan() { # scan <name> <regex>
  local name="$1" re="$2"
  # Exclude this script itself (it contains the patterns) and the scan outputs.
  local hits
  hits=$(echo "$files" | grep -v -e '^tools/leakcheck.sh$' -e 'LEAKCHECK' \
    | xargs grep -nEi "$re" 2>/dev/null \
    | grep -v 'leakcheck' | head -50 || true)
  python3 - "$name" <<EOF
import json, sys
hits = """$hits""".strip().splitlines()
print(json.dumps({sys.argv[1]: hits}))
EOF
}

{
  echo '{'
  echo "  \"scanned_head\": \"$head_sha\","
  echo "  \"scanned_at\": \"$(date -u +%Y-%m-%dT%H:%M:%SZ)\","
  echo "  \"n_files\": $n_files,"
  echo "  \"n_lines\": $n_lines,"
  echo '  "hits": {'
  first=1
  while IFS='|' read -r name re; do
    [ $first -eq 1 ] || echo ','
    first=0
    out=$(scan "$name" "$re")
    printf '    %s' "$(echo "$out" | python3 -c 'import json,sys; d=json.load(sys.stdin); k=list(d)[0]; print(json.dumps(k)+": "+json.dumps(d[k]))')"
  done <<'PATTERNS'
internal-import|import\s+(com\.anthropic|ant\.|anthropic)
internal-url|https?://[a-z0-9.-]*\.(anthropic\.com|corp\.[a-z]+\.internal)|go/[a-z-]+[^a-z]
internal-pkg2|claude-cli-internal|@anthropic-ai/
internal-bucket|s3://(anthropic|ant-|claude)|gs://(anthropic|ant-|claude)
slack-link|slack\.com/archives|#claude-code
api-key|sk-ant-|AKIA[A-Z0-9]{16}|api[_-]key\s*[:=]\s*['"][A-Za-z0-9]{20}
axon-env|AXON_[A-Z_]+|ANTHROPIC_[A-Z_]*KEY
PATTERNS
  echo ''
  echo '  }'
  echo '}'
} > LEAKCHECK_LOCAL.json

python3 -c "
import json
d = json.load(open('LEAKCHECK_LOCAL.json'))
n = sum(len(v) for v in d['hits'].values())
print(f'leakcheck: HEAD {d[\"scanned_head\"][:12]}, {d[\"n_files\"]} files / {d[\"n_lines\"]} lines scanned, {n} hits')
for k, v in d['hits'].items():
    for h in v: print(f'  [{k}] {h}')
"
