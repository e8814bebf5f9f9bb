// Minimal driver for the REFERENCE FINE / msFINE models, used only by
// experiments/longtail_parity.py for head-to-head quality comparison.
// The upstream repo ships these models as classes with no CLI binary
// (src/model/FINE.h, src/model/msFINE.h are absent from cli/Makefile:3),
// so this drives them through their public API. Positional args keep
// this file textually unrelated to the reference's ArgPos-based CLIs:
//
//   ref_fine <fine|msfine> <train> <field> <save> <sample_times>
//            <walk_steps> <negative_samples> <alpha> <threads>
//
// Compile (longtail_parity.ensure_fine_binary):
//   g++ -std=c++11 -fopenmp -Ofast ref_fine_main.cpp -o ref_fine \
//       -I$REF/src -I$REF/src/model -L$REF/bin -lproNet -lm
#include <cstdlib>
#include <string>

#include "FINE.h"
#include "msFINE.h"

int main(int argc, char** argv) {
    if (argc < 10) return 1;
    const std::string kind = argv[1];
    const std::string train = argv[2];
    const std::string field = argv[3];
    const std::string save = argv[4];
    const int sample_times = std::atoi(argv[5]);
    const int walk_steps = std::atoi(argv[6]);
    const int negatives = std::atoi(argv[7]);
    const double alpha = std::atof(argv[8]);
    const int threads = std::atoi(argv[9]);

    if (kind == "msfine") {
        msFINE model;
        model.LoadEdgeList(train, 1);
        model.LoadFieldMeta(field);
        model.Init(64);
        model.Train(sample_times, walk_steps, negatives, alpha, threads);
        model.SaveWeights(save);
    } else {
        FINE model;
        model.LoadEdgeList(train, 1);
        model.LoadFieldMeta(field);
        model.Init(64);
        model.Train(sample_times, walk_steps, negatives, alpha, threads);
        model.SaveWeights(save);
    }
    return 0;
}
