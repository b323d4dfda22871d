// Tiny driver around the REFERENCE's own SSE fixed-point NMS decoder
// (code/x86/CDecoder/NMS/CDecoder_NMS_fixed_SSE.cpp), compiled UNMODIFIED
// from /root/reference.  Companion to driver.cpp (scalar OMS): with the
// framework's NMS factor now runtime-parameterized (LayeredSpec.nms_f,
// 1/32 units — the reference's `-NMS <f>` VECTOR_MUL+DIV32 path), this
// closes the same oracle loop for NMS: golden/decoder.py's NMS semantics
// are pinned to the reference's actual compiled behaviour.
//
// The LDPC code is selected by pre-including (-include) the per-code
// x86 constantes_sse.h, exactly like driver.cpp.
//
// The SSE decoder processes 16 frames per call, frame-major in/out
// (it transposes internally; for NOEUD%16==0 the output is the RAW
// transposed APP bytes, else already-hard bits — `v > 0` maps both to
// hard bits, matching CErrorAnalyzer's decision).
//
// stdin:  frames x _N int8 LLRs (binary; frames % 16 == 0)
// stdout: frames x _N int8 hard bits (binary)
// argv:   frames iters factor [sat_var sat_msg [bench_reps]]
//
// bench_reps > 0: re-decode the last block bench_reps times and print
// "BENCH_SECONDS <s>" on stderr (see driver_oms_sse.cpp).
#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <vector>

#include "NMS/CDecoder_NMS_fixed_SSE.h"

int main(int argc, char **argv) {
    if (argc < 4) {
        fprintf(stderr,
                "usage: %s frames iters factor [sat_var sat_msg]\n",
                argv[0]);
        return 2;
    }
    int frames = atoi(argv[1]);
    int iters = atoi(argv[2]);
    int factor = atoi(argv[3]);
    int sat_var = (argc > 4) ? atoi(argv[4]) : SAT_POS_VAR;
    int sat_msg = (argc > 5) ? atoi(argv[5]) : SAT_POS_MSG;
    int bench_reps = (argc > 6) ? atoi(argv[6]) : 0;
    if (frames % 16) {
        fprintf(stderr, "frames must be a multiple of 16 (SSE lanes)\n");
        return 2;
    }

    CDecoder_NMS_fixed_SSE dec;
    dec.setVarRange(-sat_var, sat_var);
    dec.setMsgRange(-sat_msg, sat_msg);
    dec.setFactor(factor);

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
