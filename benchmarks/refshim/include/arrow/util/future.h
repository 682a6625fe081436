// Empty stub: src/ailego/math/hamming_distance_matrix.cc includes
// <arrow/util/future.h> but uses nothing from it (vestigial include).
#pragma once
