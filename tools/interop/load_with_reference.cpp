// Load a model blob exported by ftrl_ffm_tpu with the REFERENCE's own
// FFM::load_compressed_model, then print bias + sampled weights.
#include <cstdio>
#include "model/ffm.h"
#include "utils/cmd_option.h"

int main(int argc, char** argv) {
  if (argc < 5) { std::printf("usage: %s blob n_feats n_fields n_factors\n", argv[0]); return 2; }
  config_options opt;
  opt.n_feats = std::atoi(argv[2]);
  opt.n_fields = std::atoi(argv[3]);
  opt.n_factors = std::atoi(argv[4]);
  opt.init_mean = 0.0; opt.init_stddev = 0.0;
  ftrl::FFM model(opt);
  model.load_compressed_model(argv[1]);
  std::printf("bias %.6f\n", model.bias);
  for (int i : {0, 1, 7, 23, 49}) {
    std::printf("lin[%d] %.6f\n", i, model.lin_w[i]);
  }
  std::printf("vec[3][0] %.6f vec[3][5] %.6f vec[49][11] %.6f\n",
              model.vec_w[3][0], model.vec_w[3][5], model.vec_w[49][11]);
  return 0;
}
