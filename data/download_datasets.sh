#!/usr/bin/env bash
# Fetch the real-world benchmark datasets into the layouts the pna_tpu
# loaders read (reference anchor: realworld_benchmark/data/download_datasets.sh,
# which fetches the Benchmarking-GNNs pickles from the same Dropbox links).
#
#   data/molecules/{train,val,test}.pickle (+ .index)   <- ZINC raw pickles
#   data/superpixels/mnist_75sp_{train,test}.pkl        <- MNIST superpixels
#   data/superpixels/cifar10_150sp_{train,test}.pkl     <- CIFAR10 superpixels
#   data/ogbg_molhiv/{raw,split/scaffold}/*.csv.gz      <- OGB MolHIV raw CSVs
#
# The loaders (pna_tpu/data/{molecules,superpixels,hiv}.py) read these
# directly; no dgl/ogb install is needed.  On machines without egress every
# CLI falls back to --synthetic, and tests/test_data_fixtures.py exercises
# the real-file parsers against generated fixtures.
set -euo pipefail
cd "$(dirname "$0")"

fetch() {  # fetch <url> <out>
  if [ -f "$2" ]; then echo "$2 already downloaded."; return; fi
  echo "downloading $2 ..."
  curl -J -L "$1" -o "$2"   # TLS verification ON (pickles are deserialized)
  # Verify against pinned digests when available (populate sha256sums.txt on
  # a trusted machine with: sha256sum *.zip > sha256sums.txt).
  if [ -f sha256sums.txt ] && grep -q " $2\$" sha256sums.txt; then
    grep " $2\$" sha256sums.txt | sha256sum -c - || { rm -f "$2"; exit 1; }
  else
    echo "WARNING: no pinned sha256 for $2 — verify before unpickling."
  fi
}

# --- ZINC (raw per-split pickles used by molecules.py:19-27 of the reference)
mkdir -p molecules
fetch "https://www.dropbox.com/s/feo9qle74kg48gy/molecules.zip?dl=1" molecules.zip
unzip -n molecules.zip -d molecules_tmp && \
  find molecules_tmp -name '*.pickle' -exec mv -n {} molecules/ \; && \
  find molecules_tmp -name '*.index' -exec mv -n {} molecules/ \; && \
  rm -rf molecules_tmp

# --- MNIST / CIFAR10 superpixels (raw sp pickles used by superpixels.py)
mkdir -p superpixels
fetch "https://www.dropbox.com/s/bcnu2y8a4wju970/superpixels.zip?dl=1" superpixels.zip
unzip -n superpixels.zip -d superpixels_tmp && \
  find superpixels_tmp -name '*sp*.pkl' -exec mv -n {} superpixels/ \; && \
  rm -rf superpixels_tmp

# --- OGB MolHIV raw CSVs (the loader reads the csv.gz files directly)
mkdir -p ogbg_molhiv
fetch "https://snap.stanford.edu/ogb/data/graphproppred/csv_mol_download/hiv.zip" hiv.zip
unzip -n hiv.zip -d ogbg_tmp && \
  mv -n ogbg_tmp/hiv/* ogbg_molhiv/ && rm -rf ogbg_tmp

echo "done."
