// Mini yaml-cpp shim: indentation-based nested maps of scalars, explicit
// `!!int` / `!!float` / `!!bool` tags, plus the Node API surface the
// reference tools use (LoadFile, operator[], Tag, IsScalar/IsMap/IsDefined,
// as<T>, map iteration). Not a general YAML parser — just enough for the
// tools/core config files (see tools/core/README.md in the reference).
#pragma once
#include <cstdint>
#include <fstream>
#include <memory>
#include <sstream>
#include <stdexcept>
#include <string>
#include <utility>
#include <vector>

namespace YAML {

class Node;

struct NodeData {
  bool defined = false;
  bool is_map = false;
  std::string scalar;
  std::string tag = "?";
  std::vector<std::pair<std::string, std::shared_ptr<NodeData>>> entries;

  NodeData *find(const std::string &key) {
    for (auto &kv : entries)
      if (kv.first == key) return kv.second.get();
    return nullptr;
  }
};

namespace detail {
template <typename T>
T convert_scalar(const std::string &s);

template <>
inline std::string convert_scalar<std::string>(const std::string &s) {
  return s;
}
template <>
inline bool convert_scalar<bool>(const std::string &s) {
  return s == "true" || s == "True" || s == "TRUE" || s == "on" || s == "1" ||
         s == "yes";
}
template <typename T>
inline T convert_scalar(const std::string &s) {
  std::istringstream is(s);
  T v{};
  is >> v;
  if (is.fail()) throw std::runtime_error("yaml shim: bad conversion: " + s);
  return v;
}
}  // namespace detail

class Node {
 public:
  Node() : data_(std::make_shared<NodeData>()) {}
  explicit Node(std::shared_ptr<NodeData> d) : data_(std::move(d)) {}

  bool IsDefined() const { return data_ && data_->defined; }
  explicit operator bool() const { return IsDefined(); }
  bool operator!() const { return !IsDefined(); }
  bool IsMap() const { return IsDefined() && data_->is_map; }
  bool IsScalar() const { return IsDefined() && !data_->is_map; }
  bool IsSequence() const { return false; }
  bool IsNull() const { return !IsDefined(); }
  const std::string &Tag() const { return data_->tag; }
  const std::string &Scalar() const { return data_->scalar; }

  Node operator[](const std::string &key) const {
    if (IsMap()) {
      if (auto *d = data_->find(key)) {
        // share the child so mutation-free reads are cheap
        for (auto &kv : data_->entries)
          if (kv.first == key) return Node(kv.second);
        (void)d;
      }
    }
    return Node();  // undefined
  }
  Node operator[](const char *key) const { return (*this)[std::string(key)]; }

  template <typename T>
  T as() const {
    if (!IsScalar())
      throw std::runtime_error("yaml shim: as<T>() on non-scalar");
    return detail::convert_scalar<T>(data_->scalar);
  }

  class iterator;
  using const_iterator = iterator;
  inline iterator begin() const;
  inline iterator end() const;
  size_t size() const { return IsMap() ? data_->entries.size() : 0; }

  std::shared_ptr<NodeData> data_;
};

struct NodeEntry {
  Node first;
  Node second;
};

class Node::iterator {
 public:
  iterator(const NodeData *d, size_t i) : d_(d), i_(i) {}
  bool operator!=(const iterator &o) const { return i_ != o.i_; }
  bool operator==(const iterator &o) const { return i_ == o.i_; }
  iterator &operator++() {
    ++i_;
    return *this;
  }
  NodeEntry operator*() const {
    Node k;
    k.data_->defined = true;
    k.data_->scalar = d_->entries[i_].first;
    return NodeEntry{k, Node(d_->entries[i_].second)};
  }
  struct Proxy {
    NodeEntry e;
    const NodeEntry *operator->() const { return &e; }
  };
  Proxy operator->() const { return Proxy{**this}; }

 private:
  const NodeData *d_;
  size_t i_;
};

inline Node::iterator Node::begin() const {
  return iterator(data_.get(), 0);
}
inline Node::iterator Node::end() const {
  return iterator(data_.get(), IsMap() ? data_->entries.size() : 0);
}

inline Node LoadString(const std::string &text) {
  struct Line {
    int indent;
    std::string key, value;
  };
  std::vector<Line> lines;
  std::istringstream in(text);
  std::string raw;
  while (std::getline(in, raw)) {
    // strip comments (naive: config files here never embed '#' in values)
    auto hash = raw.find('#');
    if (hash != std::string::npos) raw = raw.substr(0, hash);
    size_t i = 0;
    while (i < raw.size() && raw[i] == ' ') ++i;
    std::string body = raw.substr(i);
    while (!body.empty() && (body.back() == '\r' || body.back() == ' '))
      body.pop_back();
    if (body.empty()) continue;
    auto colon = body.find(':');
    if (colon == std::string::npos)
      throw std::runtime_error("yaml shim: expected 'key: value': " + body);
    Line ln;
    ln.indent = (int)i;
    ln.key = body.substr(0, colon);
    size_t v = colon + 1;
    while (v < body.size() && body[v] == ' ') ++v;
    ln.value = body.substr(v);
    lines.push_back(std::move(ln));
  }

  auto root = std::make_shared<NodeData>();
  root->defined = true;
  root->is_map = true;
  // stack of (indent, node)
  std::vector<std::pair<int, NodeData *>> stack{{-1, root.get()}};
  for (auto &ln : lines) {
    while (stack.size() > 1 && ln.indent <= stack.back().first) stack.pop_back();
    auto child = std::make_shared<NodeData>();
    child->defined = true;
    if (ln.value.empty()) {
      child->is_map = true;
      stack.back().second->entries.emplace_back(ln.key, child);
      stack.push_back({ln.indent, child.get()});
    } else {
      std::string val = ln.value;
      if (val.rfind("!!", 0) == 0) {
        auto sp = val.find(' ');
        std::string t = val.substr(2, sp == std::string::npos ? std::string::npos
                                                              : sp - 2);
        child->tag = "tag:yaml.org,2002:" + t;
        val = sp == std::string::npos ? "" : val.substr(sp + 1);
        while (!val.empty() && val.front() == ' ') val.erase(val.begin());
      }
      if (val.size() >= 2 && ((val.front() == '"' && val.back() == '"') ||
                              (val.front() == '\'' && val.back() == '\''))) {
        val = val.substr(1, val.size() - 2);
        child->tag = "!";
      }
      child->scalar = val;
      stack.back().second->entries.emplace_back(ln.key, child);
    }
  }
  return Node(root);
}

inline Node LoadFile(const std::string &path) {
  std::ifstream fh(path);
  if (!fh) throw std::runtime_error("yaml shim: cannot open " + path);
  std::ostringstream ss;
  ss << fh.rdbuf();
  return LoadString(ss.str());
}

}  // namespace YAML
