#!/bin/sh
# Build the reference C codec as (a) Thorenc/Thordec binaries and (b) a
# shared library for ctypes property tests.  Dev-time only; tests skip if
# the outputs are absent.
set -e
REF=${1:-/root/reference}
DST=${2:-/tmp/oracle}
mkdir -p "$DST"
cp -r "$REF"/* "$DST"/
cd "$DST"
make CFLAGS="-std=c99 -O3 -fcommon -g -I common -I enc -I dec -msse4" -j8 || true
ls build/Thorenc build/Thordec
cc -std=c99 -O3 -fcommon -fPIC -shared -I common -I enc -I dec -msse4 \
  common/transform.c common/inter_prediction.c common/inter_prediction_hbd.c \
  common/intra_prediction.c common/intra_prediction_hbd.c \
  common/common_kernels.c common/common_kernels_hbd.c common/common_tables.c \
  common/simd.c common/common_block.c common/common_block_hbd.c \
  common/common_frame.c common/common_frame_hbd.c common/temporal_interp.c \
  common/temporal_interp_hbd.c common/wt_matrix.c common/snr.c common/snr_hbd.c \
  enc/enc_kernels.c enc/enc_kernels_hbd.c \
  enc/encode_block.c enc/encode_block_hbd.c \
  enc/encode_frame.c enc/encode_frame_hbd.c \
  enc/write_bits.c enc/encode_tables.c \
  enc/putbits.c enc/putvlc.c enc/rc.c \
  -lm -o /tmp/liboracle.so
echo built /tmp/liboracle.so
