#!/usr/bin/env bash
# Fetch DeepAVFusion dataset split metadata files from the upstream release.
# Usage: ./fetch_metadata.sh [filename...]   (no args = the full set)
set -euo pipefail

BASE_URL="https://raw.githubusercontent.com/stoneMo/DeepAVFusion/main/metadata"
DEST="$(cd "$(dirname "$0")" && pwd)"

ALL=(
  avsbench_test.csv avsbench_train.txt avsbench_val.csv
  flickr_10k.txt flickr_144k.txt flickr_sup_train.txt flickr_test.csv
  music_duet.json music_duet_test.csv music_duet_train.txt
  vgginstruments_test.csv vgginstruments_train.txt
  vggmusic_eval_ss.csv vggmusic_train.txt
  vggsound_test.csv vggss.json vggss_10k.txt vggss_144k.txt
  vggss_heard.txt vggss_heard_test.csv vggss_test.csv vggss_unheard_test.csv
)

files=("$@")
[ ${#files[@]} -eq 0 ] && files=("${ALL[@]}")

for f in "${files[@]}"; do
  echo "fetching $f"
  curl -fsSL "$BASE_URL/$f" -o "$DEST/$f"
done

# verify anything we have checksums for
(cd "$DEST" && sha256sum --ignore-missing -c SHA256SUMS)
echo "done."
