// Minimal magic_enum shim (enum_count / enum_integer / enum_name /
// enum_cast) using the standard __PRETTY_FUNCTION__ probing trick.
// Supports enum values in [0, 64). Written to compile the reference engine
// for head-to-head benchmarking (vendored thirdparty is absent here).
#pragma once
#include <array>
#include <cstddef>
#include <optional>
#include <string_view>
#include <type_traits>

namespace magic_enum {

namespace detail {

template <typename E, E V>
constexpr std::string_view raw_name() {
  // gcc: "constexpr std::string_view ...raw_name() [with E = Color; E V = Color::RED; ...]"
  std::string_view name = __PRETTY_FUNCTION__;
  auto pos = name.rfind("V = ");
  if (pos == std::string_view::npos) return {};
  name.remove_prefix(pos + 4);
  auto end = name.find_first_of(";]");
  if (end != std::string_view::npos) name = name.substr(0, end);
  // "(Color)7" for invalid values; "Color::RED" (possibly namespace-qualified)
  // for valid ones.
  if (!name.empty() && (name.front() == '(' || (name.front() >= '0' && name.front() <= '9') || name.front() == '-'))
    return {};
  auto colon = name.rfind("::");
  if (colon != std::string_view::npos) name.remove_prefix(colon + 2);
  return name;
}

constexpr int kProbeMax = 64;

template <typename E, std::size_t... I>
constexpr std::array<std::string_view, sizeof...(I)> names_impl(
    std::index_sequence<I...>) {
  return {{raw_name<E, static_cast<E>(static_cast<int>(I))>()...}};
}

template <typename E>
constexpr auto names_array =
    names_impl<E>(std::make_index_sequence<kProbeMax>{});

}  // namespace detail

template <typename E>
constexpr std::size_t enum_count() {
  std::size_t n = 0;
  for (auto &s : detail::names_array<E>)
    if (!s.empty()) ++n;
  return n;
}

template <typename E>
constexpr auto enum_integer(E v) {
  return static_cast<std::underlying_type_t<E>>(v);
}

template <typename E>
constexpr std::string_view enum_name(E v) {
  auto i = static_cast<long long>(enum_integer(v));
  if (i >= 0 && i < detail::kProbeMax)
    return detail::names_array<E>[static_cast<std::size_t>(i)];
  return {};
}

template <typename E>
constexpr std::optional<E> enum_cast(std::string_view name) {
  for (int i = 0; i < detail::kProbeMax; ++i) {
    if (!detail::names_array<E>[i].empty() &&
        detail::names_array<E>[i] == name)
      return static_cast<E>(i);
  }
  return std::nullopt;
}

}  // namespace magic_enum
