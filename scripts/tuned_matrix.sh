#!/bin/bash
# Dev helper: re-drive the correctness gate at non-default knob sets
# (SURVEY §12 "tuned runs verified, not just defaults"). Each combo
# exercises every knob the queries under test interpolate, at a value
# that demonstrably changes behavior, and must stay hash-green.
# Usage: scripts/tuned_matrix.sh [sf-dir]   (default /root/testdata/sf0.01)
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}"
run() {
  local name="$1" filter="$2"; shift 2
  local out="/tmp/graft_tuned_$name"
  echo "=== $name: $* ==="
  if [ -n "$filter" ]; then
    env "$@" scripts/run.sh graft.Verify "$SF" "$out" "$filter" 2>/dev/null | tail -1
  else
    env "$@" scripts/run.sh graft.Verify "$SF" "$out" 2>/dev/null | tail -1
  fi
  python3 scripts/check.py "$SF" "$out" | tail -1
}
# A: ANN/PQ geometry + the lloydIters=0 seed-codebook edge (q67 pins
# the per-knob STORED index artifact at this geometry)
run a q40,q41,q43,q44,q45,q47,q48,q49,q67,q68 \
  GRAFT_TUNING_ANN_QUERIES=5 GRAFT_TUNING_PQ_SUBSPACES=4 \
  GRAFT_TUNING_PQ_SUB_DIM=16 GRAFT_TUNING_PQ_CENTROIDS=32 \
  GRAFT_TUNING_REFINE_FACTOR=2 GRAFT_TUNING_NPROBE=4 \
  GRAFT_TUNING_LLOYD_ITERS=0
# B: dedup/assembly knobs (q69/q72/q33/q35/q73 pin the per-knob STORED
# signature lake and both serving halves at this geometry; bloomBits=1024
# floods q77's prescreen with false positives the verify must erase;
# outlierK=3 reshapes q78's per-label cut)
# (verifyPairBudget=5 forces the chunked exact verify — many bounded
# passes — through the same hash gate; bpeMerges=12 re-trains and
# re-unrolls the BPE oracle at a non-default depth; dfCap=50 also
# narrows q86's posting lists and runMinTokens=9 widens its report;
# bandBucketCap=3 engages the optional band-bucket ceiling — buckets
# over 3 docs are dropped before pairing, a results-changing cut the
# oracle must mirror in q32/q38/q72/q81; bpeSampleMod=2 trains the
# tokenizer on the half-corpus sample while q83/q84 still apply it to
# every document — the oracle's separate apply chain must mirror both;
# q91 serves the stored tokenizer, so its probe-side merge replay must
# mirror the sampled training chain too; bpeMinFreq=2 + bpeVocabCap=40
# bound the TRAINING vocabulary — frequency floor as a HAVING, top-K as
# an ORDER BY/LIMIT — while the apply chain still segments every word;
# the SP unigram tokenizer (q108/q109) trains on the SAME bounded view
# and here runs at a non-default geometry (spVocab=30 makes the prune
# bite, spPieceLen=3 reshapes the seed and the Viterbi fan-in,
# spIters=1 shortens the unrolled EM chain) composed with NFC+pretok;
# normalizeNfc=1 NFC-normalizes text before every tokenize/fingerprint,
# composed here with the full dedup/BPE knob stack so both engines'
# oracles interpolate nfc_normalize at a non-default geometry;
# bpeEscape=1 lifts the BPE charset contract — paren words join the
# vocabulary through the delimiter escape, composed with the sampled/
# floored/capped training view and NFC so q82-q91 train and serve in
# the escaped seg domain, and q93/q94 exercise it on the paren fixture;
# bpePretok=1 composes the THIRD text knob — GPT-2 regex
# pretokenization on every BPE surface, exercised on the contraction
# fixture by q96/q97 and composed here with NFC + escape + the bounded
# training view; q98's interchange round trip re-exports/re-imports
# under the full composed text-knob stack; q100/q101/q102/q103
# interpolate NFC through the shared tokenizer — q99 is knob-free but
# rides along as the text tier's newest gate)
# (q104-q106 ride with dhashMaxHamming=2 + dhashBandCap=8 — a tighter
# verify threshold and a band-bucket ceiling low enough to drop the
# flat-raster buckets at sf0.01, both results-changing cuts the oracle
# mirrors; q107 re-interpolates the bigram mix at λ=0.4; q110
# re-interpolates the stupid-backoff discount at α=0.7)
run b q29,q31,q32,q33,q35,q38,q39,q59,q69,q72,q73,q77,q78,q79,q81,q82,q83,q84,q86,q87,q88,q89,q90,q91,q93,q94,q95,q96,q97,q98,q99,q100,q101,q102,q103,q104,q105,q106,q107,q108,q109,q110 \
  GRAFT_TUNING_SP_VOCAB=30 GRAFT_TUNING_SP_PIECE_LEN=3 \
  GRAFT_TUNING_SP_ITERS=1 GRAFT_TUNING_LM_LAMBDA_PER_MILLE=400 \
  GRAFT_TUNING_LM_ALPHA_PER_MILLE=700 \
  GRAFT_TUNING_DHASH_MAX_HAMMING=2 GRAFT_TUNING_DHASH_BAND_CAP=8 \
  GRAFT_TUNING_CC_EDGE_JACCARD=0.3 GRAFT_TUNING_MINHASH_BANDS=4 \
  GRAFT_TUNING_MINHASH_ROWS=4 GRAFT_TUNING_DF_CAP=50 \
  GRAFT_TUNING_SOURCE_QUOTA=7 GRAFT_TUNING_KMV_K=128 \
  GRAFT_TUNING_BLOOM_BITS=1024 GRAFT_TUNING_OUTLIER_K=3 \
  GRAFT_TUNING_VERIFY_PAIR_BUDGET=5 GRAFT_TUNING_BPE_MERGES=12 \
  GRAFT_TUNING_RUN_MIN_TOKENS=9 GRAFT_TUNING_BAND_BUCKET_CAP=3 \
  GRAFT_TUNING_BPE_SAMPLE_MOD=2 GRAFT_TUNING_BPE_MIN_FREQ=2 \
  GRAFT_TUNING_BPE_VOCAB_CAP=40 GRAFT_TUNING_NORMALIZE_NFC=1 \
  GRAFT_TUNING_BPE_ESCAPE=1 GRAFT_TUNING_BPE_PRETOK=1
# P: the PRODUCTION PROFILE (Tuning.production) as its own combo —
# the one-decision knob set a real deployment runs (NFC + escape +
# pretok + hapax floor + vocab cap + band-bucket ceiling), full
# registry, so "the profile is hash-green end-to-end" is a standing
# matrix fact rather than a README promise
run p "" GRAFT_PROFILE=production
# C: partial PQ coverage (2 subspaces of 8 — the uncovered-dims bound)
run c q40,q47,q48,q49,q67,q68 \
  GRAFT_TUNING_PQ_SUBSPACES=2 GRAFT_TUNING_ANN_QUERIES=3
# D: hostile all-boundary set — every integer knob at its floor,
# ccEdgeJaccard at its ceiling, deep Lloyd chain — FULL registry
run d "" \
  GRAFT_TUNING_DF_CAP=1 GRAFT_TUNING_MINHASH_BANDS=1 \
  GRAFT_TUNING_MINHASH_ROWS=1 GRAFT_TUNING_MINHASH_BUCKET_CAP=1 \
  GRAFT_TUNING_LSH_TABLES=1 GRAFT_TUNING_LSH_BUCKET_CAP=1 \
  GRAFT_TUNING_NPROBE=1 GRAFT_TUNING_LLOYD_ITERS=5 \
  GRAFT_TUNING_SOURCE_QUOTA=1 GRAFT_TUNING_KMV_K=1 \
  GRAFT_TUNING_ANN_QUERIES=1 GRAFT_TUNING_CC_EDGE_JACCARD=1.0 \
  GRAFT_TUNING_PQ_SUBSPACES=1 GRAFT_TUNING_PQ_SUB_DIM=1 \
  GRAFT_TUNING_PQ_CENTROIDS=1 GRAFT_TUNING_REFINE_FACTOR=1 \
  GRAFT_TUNING_BLOOM_BITS=8 GRAFT_TUNING_OUTLIER_K=1 \
  GRAFT_TUNING_VERIFY_PAIR_BUDGET=1 GRAFT_TUNING_BPE_MERGES=1 \
  GRAFT_TUNING_RUN_MIN_TOKENS=8 GRAFT_TUNING_BPE_VOCAB_CAP=1 \
  GRAFT_TUNING_SP_VOCAB=1 GRAFT_TUNING_SP_PIECE_LEN=1 \
  GRAFT_TUNING_SP_ITERS=0 GRAFT_TUNING_DHASH_MAX_HAMMING=0 \
  GRAFT_TUNING_DHASH_BAND_CAP=1 GRAFT_TUNING_LM_LAMBDA_PER_MILLE=0 \
  GRAFT_TUNING_LM_ALPHA_PER_MILLE=1000
echo "=== tuned matrix complete ==="
