// Driver around the REFERENCE's SSE fixed-point OMS decoder
// (code/x86/CDecoder/OMS/CDecoder_OMS_fixed_SSE.cpp), compiled UNMODIFIED.
// Companion to driver_nms_sse.cpp; same 16-frame frame-major IO contract
// (the decoder requires vSAT_POS_VAR == 127 for its 8-bit path and runs
// fixed iterations — its fast_stop path is commented out in the source).
//
// stdin:  frames x _N int8 LLRs (binary; frames % 16 == 0)
// stdout: frames x _N int8 hard bits (binary)
// argv:   frames iters offset [sat_msg [bench_reps]]
//
// bench_reps > 0: after the normal decode pass, re-decode the LAST
// 16-frame block bench_reps more times and print
// "BENCH_SECONDS <s>" on stderr — a pure decode-loop timing of the
// reference's own code (the per-call transpose is part of its decode
// path, T1), with IO excluded.
#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <vector>

#include "OMS/CDecoder_OMS_fixed_SSE.h"

int main(int argc, char **argv) {
    if (argc < 4) {
        fprintf(stderr, "usage: %s frames iters offset [sat_msg]\n",
                argv[0]);
        return 2;
    }
    int frames = atoi(argv[1]);
    int iters = atoi(argv[2]);
    int offset = atoi(argv[3]);
    int sat_msg = (argc > 4) ? atoi(argv[4]) : SAT_POS_MSG;
    int bench_reps = (argc > 5) ? atoi(argv[5]) : 0;
    if (frames % 16) {
        fprintf(stderr, "frames must be a multiple of 16 (SSE lanes)\n");
        return 2;
    }

    CDecoder_OMS_fixed_SSE dec;
    dec.setVarRange(-127, 127);  // decode() requires the 8-bit path
    dec.setMsgRange(-sat_msg, sat_msg);
    dec.setOffset(offset);

    std::vector<char> in(16 * NOEUD), out(16 * NOEUD);
    for (int b = 0; b < frames / 16; ++b) {
        if (fread(in.data(), 1, in.size(), stdin) != in.size()) {
            fprintf(stderr, "short read\n");
            return 1;
        }
        dec.decode(in.data(), out.data(), iters);
        for (size_t i = 0; i < out.size(); ++i) {
            out[i] = out[i] > 0 ? 1 : 0;
        }
        fwrite(out.data(), 1, out.size(), stdout);
    }
    if (bench_reps > 0) {
        auto t0 = std::chrono::steady_clock::now();
        for (int r = 0; r < bench_reps; ++r) {
            dec.decode(in.data(), out.data(), iters);
        }
        std::chrono::duration<double> dt =
            std::chrono::steady_clock::now() - t0;
        fprintf(stderr, "BENCH_SECONDS %.6f\n", dt.count());
    }
    return 0;
}
