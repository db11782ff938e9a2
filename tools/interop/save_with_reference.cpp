// Save a model with the REFERENCE's FFM::save_compressed_model using known
// weight values; our import_reference_model must read them back exactly.
#include <cstdio>
#include "model/ffm.h"
#include "utils/cmd_option.h"

int main() {
  config_options opt;
  opt.n_feats = 50; opt.n_fields = 4; opt.n_factors = 3;
  opt.init_mean = 0.0; opt.init_stddev = 0.0;
  ftrl::FFM model(opt);
  model.bias = 0.125f;
  for (int i = 0; i < 50; ++i) model.lin_w[i] = 0.001f * i;
  for (int i = 0; i < 50; ++i)
    for (int j = 0; j < 12; ++j) model.vec_w[i][j] = 0.01f * i + 0.0001f * j;
  model.save_compressed_model("/tmp/ref_saved_model.zst", 3);
  std::printf("saved\n");
  return 0;
}
