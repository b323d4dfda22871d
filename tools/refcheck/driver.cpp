// Tiny driver around the REFERENCE's own scalar fixed-point OMS decoder
// (code/ldpc_decoder_arm/CDecoder/OMS/CDecoder_OMS_fixed_x86.cpp), compiled
// UNMODIFIED from /root/reference.  This closes the oracle loop: every
// bit-exactness claim in this repo bottoms out in golden/decoder.py, which
// was written by *reading* the reference; this binary lets tests diff the
// golden model against the reference's actual compiled behaviour.
//
// The LDPC code is selected by pre-including (-include) the per-code
// constantes_sse.h before any reference header; its include guards
// (CONSTANTES / _PosNoeudsVariable_) then neutralize the reference's own
// hardwired 4000x2000 selector.
//
// stdin:  frames x _N int8 LLRs (binary)
// stdout: frames x _N int8 hard bits (binary)
// argv:   frames iters offset early_term [sat_var sat_msg]
#include <cstdio>
#include <cstdlib>

#include "OMS/CDecoder_OMS_fixed_x86.h"

int main(int argc, char **argv) {
    if (argc < 5) {
        fprintf(stderr,
                "usage: %s frames iters offset early [sat_var sat_msg]\n",
                argv[0]);
        return 2;
    }
    int frames = atoi(argv[1]);
    int iters = atoi(argv[2]);
    int offset = atoi(argv[3]);
    int early = atoi(argv[4]);
    int sat_var = (argc > 5) ? atoi(argv[5]) : SAT_POS_VAR;
    int sat_msg = (argc > 6) ? atoi(argv[6]) : SAT_POS_MSG;

    CDecoder_OMS_fixed_x86 dec;
    dec.setVarRange(-sat_var, sat_var);
    dec.setMsgRange(-sat_msg, sat_msg);
    dec.setOffset(offset);
    dec.setEarlyTerm(early != 0);

    signed char *llr = new signed char[_N];
    signed char *out = new signed char[_N];
    for (int f = 0; f < frames; f++) {
        if (fread(llr, 1, _N, stdin) != (size_t)_N) {
            fprintf(stderr, "short read at frame %d\n", f);
            return 1;
        }
        dec.decode(llr, out, iters);
        fwrite(out, 1, _N, stdout);
    }
    delete[] llr;
    delete[] out;
    return 0;
}
