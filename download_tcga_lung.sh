#!/usr/bin/env bash
# Download TCGA lung (LUAD/LUSC) diagnostic slides from the GDC using the
# manifest files (counterpart of the reference download_tcga_lung.sh, L0 of
# SURVEY.md §1). Requires the gdc-client binary on PATH and network access.
set -euo pipefail

MANIFEST_DIR=${1:-datasets/tcga/manifests}
OUT_DIR=${2:-downloads/tcga}

mkdir -p "$OUT_DIR/luad" "$OUT_DIR/lusc"

if ! command -v gdc-client >/dev/null; then
  echo "gdc-client not found on PATH — install it from the GDC site" >&2
  exit 1
fi

gdc-client download -m "$MANIFEST_DIR/luad_manifest.txt" -d "$OUT_DIR/luad"
gdc-client download -m "$MANIFEST_DIR/lusc_manifest.txt" -d "$OUT_DIR/lusc"

echo "Done. Organize into datasets/tcga/{0_luad,1_lusc}/ before tiling."
