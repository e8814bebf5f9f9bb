// Probe driver for the REFERENCE APP model, used only by
// experiments/structured_parity.py. APP's proximity is asymmetric by
// design (source role = w_vertex, target role = w_context,
// src/model/APP.cpp:59-125), but its SaveWeights dumps only w_vertex
// (APP.cpp:13-33) -- a symmetric cosine probe on that file cannot see
// the learned proximity (VERDICT r2 Weak #5). This driver trains the
// unmodified reference model through its public API and saves BOTH
// tables so the vertex x context probe can score it.
//
//   ref_app <train> <save_vertex> <save_context> <undirected>
//           <walk_times> <sample_times> <jump> <negatives> <alpha>
//           <threads>
//
// Compile (structured_parity.ensure_app_binary):
//   g++ -std=c++11 -fopenmp -Ofast ref_app_main.cpp -o ref_app \
//       -I$REF/src -I$REF/src/model -L$REF/bin -lproNet -lm
#include <cstdlib>
#include <fstream>
#include <string>

#include "APP.h"

static void dump(APP& model, const std::string& path,
                 std::vector<std::vector<double>>& table) {
    std::ofstream out(path);
    out << model.pnet.MAX_vid << " " << model.dim << "\n";
    for (long vid = 0; vid != model.pnet.MAX_vid; ++vid) {
        out << model.pnet.vertex_hash.keys[vid];
        for (int d = 0; d < model.dim; ++d) out << " " << table[vid][d];
        out << "\n";
    }
}

int main(int argc, char** argv) {
    if (argc < 11) return 1;
    APP model;
    model.LoadEdgeList(argv[1], std::atoi(argv[4]));
    model.Init(64);
    model.Train(std::atoi(argv[5]), std::atoi(argv[6]),
                std::atof(argv[7]), std::atoi(argv[8]),
                std::atof(argv[9]), std::atoi(argv[10]));
    dump(model, argv[2], model.w_vertex);
    dump(model, argv[3], model.w_context);
    return 0;
}
