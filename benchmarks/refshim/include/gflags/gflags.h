// Minimal gflags shim: DEFINE_*/DECLARE_* macros + ParseCommandLineFlags
// supporting --flag=value and --flag value forms. Enough for
// tools/core/txt2vecs.cc and friends.
#pragma once
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <functional>
#include <map>
#include <string>

namespace gflags {

struct FlagRegistry {
  static FlagRegistry &inst() {
    static FlagRegistry r;
    return r;
  }
  std::map<std::string, std::function<void(const std::string &)>> setters;
};

struct FlagRegisterer {
  FlagRegisterer(const char *name,
                 std::function<void(const std::string &)> set) {
    FlagRegistry::inst().setters[name] = std::move(set);
  }
};

inline void SetUsageMessage(const std::string &) {}
inline void SetVersionString(const std::string &) {}
inline void ShowUsageWithFlags(const char *) {}

inline uint32_t ParseCommandLineFlags(int *argc, char ***argv, bool) {
  int out = 1;
  auto &reg = FlagRegistry::inst();
  for (int i = 1; i < *argc; ++i) {
    char *arg = (*argv)[i];
    if (std::strncmp(arg, "--", 2) != 0) {
      (*argv)[out++] = arg;
      continue;
    }
    std::string body = arg + 2;
    std::string name, value;
    auto eq = body.find('=');
    if (eq != std::string::npos) {
      name = body.substr(0, eq);
      value = body.substr(eq + 1);
    } else {
      name = body;
      auto it0 = reg.setters.find(name);
      if (it0 != reg.setters.end() && i + 1 < *argc) {
        value = (*argv)[++i];
      } else {
        value = "true";  // bare boolean flag
      }
    }
    auto it = reg.setters.find(name);
    if (it != reg.setters.end()) it->second(value);
  }
  *argc = out;
  return 1;
}

}  // namespace gflags

namespace google {
using gflags::ParseCommandLineFlags;
using gflags::SetUsageMessage;
}  // namespace google

#define DEFINE_string(name, val, txt)                                 \
  std::string FLAGS_##name = val;                                     \
  static gflags::FlagRegisterer reg_##name(                           \
      #name, [](const std::string &v) { FLAGS_##name = v; })

#define DEFINE_int32(name, val, txt)                                  \
  int32_t FLAGS_##name = val;                                         \
  static gflags::FlagRegisterer reg_##name(                           \
      #name, [](const std::string &v) { FLAGS_##name = std::atoi(v.c_str()); })

#define DEFINE_uint32(name, val, txt)                                 \
  uint32_t FLAGS_##name = val;                                        \
  static gflags::FlagRegisterer reg_##name(#name, [](const std::string &v) { \
    FLAGS_##name = (uint32_t)std::strtoul(v.c_str(), nullptr, 10);    \
  })

#define DEFINE_int64(name, val, txt)                                  \
  int64_t FLAGS_##name = val;                                         \
  static gflags::FlagRegisterer reg_##name(#name, [](const std::string &v) { \
    FLAGS_##name = std::strtoll(v.c_str(), nullptr, 10);              \
  })

#define DEFINE_uint64(name, val, txt)                                 \
  uint64_t FLAGS_##name = val;                                        \
  static gflags::FlagRegisterer reg_##name(#name, [](const std::string &v) { \
    FLAGS_##name = std::strtoull(v.c_str(), nullptr, 10);             \
  })

#define DEFINE_double(name, val, txt)                                 \
  double FLAGS_##name = val;                                          \
  static gflags::FlagRegisterer reg_##name(                           \
      #name, [](const std::string &v) { FLAGS_##name = std::atof(v.c_str()); })

#define DEFINE_bool(name, val, txt)                                   \
  bool FLAGS_##name = val;                                            \
  static gflags::FlagRegisterer reg_##name(#name, [](const std::string &v) { \
    FLAGS_##name = (v != "false" && v != "0");                        \
  })

#define DECLARE_string(name) extern std::string FLAGS_##name
#define DECLARE_int32(name) extern int32_t FLAGS_##name
#define DECLARE_uint32(name) extern uint32_t FLAGS_##name
#define DECLARE_int64(name) extern int64_t FLAGS_##name
#define DECLARE_uint64(name) extern uint64_t FLAGS_##name
#define DECLARE_double(name) extern double FLAGS_##name
#define DECLARE_bool(name) extern bool FLAGS_##name
