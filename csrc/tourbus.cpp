// Tour-Bus bubble pinching over the flat unitig graph.
//
// Faithful native reimplementation of the reference's bubblePinch
// (reference src/bubble.c:2048-2135): a coverage-weighted Dijkstra
// from every eligible edge (tourBus/tourBusNode/tourBusArc,
// bubble.c:1894-2046), backtracking re-converging paths bounded by
// MAXNODELENGTH (comparePaths, :1766-1892), a global NW identity
// check with the DIFF window (compareSequences, :425-497), and a
// minority-onto-majority merge (cleanUpRedundancy, :1617-1738;
// combineCOV :1003, remapNodeOntoNeighbour :1008-1031).
//
// The graph arrives as flat arrays (0-based edge ids, explicit twin
// array, COO arcs); the merge surgery maps each unshared slow-path
// node onto the fast-path node covering the same sequence interval
// (node splitting at mismatched boundaries is not reproduced — the
// merge SET matches the reference; only post-merge node boundaries on
// the surviving path may differ).
//
// Host-side native component by design: the bubble pass runs once per
// contig stage on the condensed graph (edges << kmers); the device
// path stays jax/XLA (see graph/bubbles.py for the vectorized
// parallel-edge fast path).

#include <cstdint>
#include <cstring>
#include <map>
#include <set>
#include <vector>

namespace {

constexpr int MAXREADLENGTH = 100;  // bubble.c:36
constexpr int MAXCONNECTION = 100;  // bubble.c:37

struct Graph {
    int32_t n_edges;
    const int32_t *length;
    int32_t *cvg;
    const int32_t *twin;
    uint8_t *deleted;
    const int64_t *seq_off;
    const uint8_t *seq_pool;
    int32_t max_edge_cov;
    int overlaplen;  // K
    int MAXNODELENGTH;
    int DIFF;
    double cutoff;  // 1 - 0.9

    // arcs: per-node sorted map to -> multiplicity (deterministic order)
    std::vector<std::map<int32_t, int32_t>> arcs;

    std::vector<double> times;
    std::vector<int32_t> previous;
    std::vector<uint8_t> multi;    // node status (bubble.c resetNodeStatus)
    std::vector<uint8_t> in_heap;
    std::set<std::pair<double, int32_t>> heap;
    std::vector<int32_t> expanded;
    bool has_changed = false;

    int64_t bt_counter = 0, cmp_counter = 0, pin_counter = 0;
};

int32_t tw(const Graph &g, int32_t e) { return g.twin[e]; }

// reference resetNodeStatus (bubble.c:185-243): palindromes and
// twin-adjacent (hairpin) edges are never expanded or used as dests.
void reset_node_status(Graph &g) {
    g.multi.assign(g.n_edges, 0);
    for (int32_t e = 0; e < g.n_edges; ++e) {
        int32_t b = tw(g, e);
        if (b == e) { g.multi[e] = 1; continue; }
        bool hair = g.arcs[e].count(b) || g.arcs[b].count(e);
        if (hair) { g.multi[e] = 1; g.multi[b] = 1; }
    }
}

// reference isPreviousToNode (bubble.c:327-352)
bool is_previous_to_node(const Graph &g, int32_t prev, int32_t target) {
    int32_t cur = target, pnode = -1;
    double t = g.times[target];
    while (cur >= 0) {
        if (cur == prev) return true;
        if (cur == pnode) return false;
        if (g.times[cur] != t) return false;
        pnode = cur;
        cur = g.previous[cur];
    }
    return false;
}

// extractSequence (bubble.c:374-417): concat interior edges' bases.
// path = [ancestor, ..., end]; interior = path[1..len-2].
int extract_sequence(const Graph &g, const std::vector<int32_t> &path,
                     uint8_t *seq) {
    int total = 0;
    for (size_t i = 1; i + 1 < path.size(); ++i)
        total += g.length[path[i]];
    if (total > MAXREADLENGTH) return -1;
    int w = 0;
    for (size_t i = 1; i + 1 < path.size(); ++i) {
        int32_t e = path[i];
        const uint8_t *s = g.seq_pool + g.seq_off[e];
        for (int32_t j = 0; j < g.length[e]; ++j) seq[w++] = s[j];
    }
    return total;
}

// compareSequences (bubble.c:425-497): global NW, match=1 (SIM
// identity), mismatch/indel=0; accept iff score >= maxLen - DIFF and
// identity >= 0.9; hard gates |l1-l2| <= 2 and both >= K-1.
bool compare_sequences(const Graph &g, const uint8_t *s1, const uint8_t *s2,
                       int l1, int l2) {
    if (l1 == 0 || l2 == 0) return false;
    if (l1 - l2 > 2 || l2 - l1 > 2) return false;
    if (l1 < g.overlaplen - 1 || l2 < g.overlaplen - 1) return false;
    static int F[MAXREADLENGTH + 1][MAXREADLENGTH + 1];
    for (int i = 0; i <= l1; ++i) F[i][0] = 0;
    for (int j = 0; j <= l2; ++j) F[0][j] = 0;
    for (int i = 1; i <= l1; ++i)
        for (int j = 1; j <= l2; ++j) {
            int c1 = F[i - 1][j - 1] + (s1[i - 1] == s2[j - 1] ? 1 : 0);
            int c2 = F[i - 1][j];
            int c3 = F[i][j - 1];
            int m = c1 > c2 ? c1 : c2;
            F[i][j] = m > c3 ? m : c3;
        }
    int score = F[l1][l2];
    int maxlen = l1 > l2 ? l1 : l2;
    if (score < maxlen - g.DIFF) return false;
    if (1.0 - (double)score / maxlen > g.cutoff) return false;
    return true;
}

void heap_insert(Graph &g, int32_t node, double t) {
    g.heap.insert({t, node});
    g.in_heap[node] = 1;
}

void heap_erase(Graph &g, int32_t node, double t) {
    g.heap.erase({t, node});
    g.in_heap[node] = 0;
}

// combineCOV (bubble.c:998-1006)
void combine_cov(Graph &g, int32_t src, int32_t len_s, int32_t dst,
                 int32_t len_t) {
    if (len_t <= 0) return;
    long cov = ((long)len_s * g.cvg[src] + (long)len_t * g.cvg[dst]) / len_t;
    if (cov > g.max_edge_cov) cov = g.max_edge_cov;
    g.cvg[dst] = (int32_t)cov;
    g.cvg[tw(g, dst)] = (int32_t)cov;
}

// remapNodeArcsOntoNeighbour/-Target (bubble.c:927-966), generalized
// positionally: the merged-away node spans a sequence interval of the
// surviving path, so its OUT-arcs re-attach to the fast node covering
// its END (f_end) and its IN-arcs to the node covering its START
// (f_start) — the effect of the reference's split-at-boundary
// machinery without materializing splits.  Twin symmetry: out-arcs of
// twin(src) (= in-arcs of src reversed) go to twin(f_start); arcs
// naming src/twin(src) from elsewhere rewrite to f_start/twin(f_end).
void remap_arcs(Graph &g, int32_t src, int32_t f_start, int32_t f_end) {
    int32_t bsrc = tw(g, src);
    int32_t b_out = tw(g, f_start);  // destination of twin(src)'s arcs
    // collect inbound-arc owners before moving anything: every arc
    // x->src has twin bsrc->tw(x), so owners(x) = tw(arcs[bsrc]);
    // likewise owners of w->bsrc = tw(arcs[src]).
    std::vector<int32_t> owners;
    for (auto &kv : g.arcs[bsrc]) owners.push_back(tw(g, kv.first));
    for (auto &kv : g.arcs[src]) owners.push_back(tw(g, kv.first));
    for (int pass = 0; pass < 2; ++pass) {
        int32_t s = pass ? bsrc : src;
        int32_t d = pass ? b_out : f_end;
        for (auto &kv : g.arcs[s]) {
            int32_t to = kv.first;
            if (to == src) to = f_start;
            else if (to == bsrc) to = tw(g, f_end);
            if (to == d) continue;  // collapse self-arc
            g.arcs[d][to] += kv.second;
        }
        g.arcs[s].clear();
    }
    for (int32_t x : owners) {
        if (x < 0 || x >= g.n_edges || x == src || x == bsrc) continue;
        auto &m = g.arcs[x];
        for (int32_t s : {src, bsrc}) {
            auto it = m.find(s);
            if (it == m.end()) continue;
            int32_t d = (s == src) ? f_start : tw(g, f_end);
            int32_t mult = it->second;
            m.erase(it);
            if (x != d) m[d] += mult;
        }
    }
    g.has_changed = true;
}

// remapNodeFibHeapReferencesOntoNode (bubble.c:967-996): drop the
// merged-away node's heap entry (its target, being on the surviving
// path, is already expanded or heaped with its own time).
void remap_refs(Graph &g, int32_t src, int32_t dst) {
    (void)dst;
    for (int32_t s : {src, tw(g, src)}) {
        if (g.in_heap[s]) heap_erase(g, s, g.times[s]);
    }
}

// remapNodeOntoNeighbour (bubble.c:1008-1031)
void remap_node(Graph &g, int32_t src, int32_t f_start, int32_t f_end) {
    combine_cov(g, src, g.length[src], f_start, g.length[f_start]);
    remap_refs(g, src, f_start);
    remap_arcs(g, src, f_start, f_end);
    g.deleted[src] = 1;
    g.deleted[tw(g, src)] = 1;
    // previous[] is only ever read for nodes with times set — exactly
    // the expanded + still-heaped set of the current tour (the
    // remapNodeInwardReferencesOntoNode analogue, bubble.c:779-797).
    auto fix = [&](int32_t x) {
        if (g.previous[x] == src) g.previous[x] = f_start;
        else if (g.previous[x] == tw(g, src))
            g.previous[x] = tw(g, f_end);
    };
    for (int32_t x : g.expanded) fix(x);
    for (auto &p : g.heap) fix(p.second);
}

// cleanUpRedundancy (bubble.c:1617-1738), simplified: each unshared
// slow interior node merges onto the fast interior node covering the
// same start offset (no node splitting — see file header).
void clean_up(Graph &g, const std::vector<int32_t> &fast,
              const std::vector<int32_t> &slow) {
    // start offsets of interiors
    std::vector<int32_t> fstart(fast.size(), 0), sstart(slow.size(), 0);
    for (size_t i = 2; i + 1 < fast.size(); ++i)
        fstart[i] = fstart[i - 1] + g.length[fast[i - 1]];
    for (size_t i = 2; i + 1 < slow.size(); ++i)
        sstart[i] = sstart[i - 1] + g.length[slow[i - 1]];
    std::set<int32_t> on_fast(fast.begin(), fast.end());
    for (size_t i = 1; i + 1 < slow.size(); ++i) {
        int32_t s = slow[i];
        if (on_fast.count(s) || on_fast.count(tw(g, s))) continue;
        if (g.deleted[s] || tw(g, s) == s) continue;
        // fast interior nodes covering s's start and end offsets
        auto covering = [&](int32_t off) -> int32_t {
            for (size_t j = 1; j + 1 < fast.size(); ++j)
                if (fstart[j] <= off &&
                    (j + 2 == fast.size() ||
                     off < fstart[j] + g.length[fast[j]]))
                    return fast[j];
            return fast.size() > 2 ? fast[fast.size() - 2] : -1;
        };
        int32_t f_start = covering(sstart[i]);
        int32_t f_end =
            covering(sstart[i] + (g.length[s] > 0 ? g.length[s] - 1 : 0));
        if (f_start < 0 || f_end < 0) continue;
        if (g.deleted[f_start] || g.deleted[f_end]) continue;
        if (f_start == s || f_start == tw(g, s) || f_end == s ||
            f_end == tw(g, s))
            continue;
        remap_node(g, s, f_start, f_end);
    }
    ++g.pin_counter;
    g.has_changed = true;
}

// comparePaths (bubble.c:1766-1892)
void compare_paths(Graph &g, int32_t destination, int32_t origin) {
    int slow_len = 0, fast_len = 0;
    int32_t fast_node = destination, slow_node = origin;
    ++g.bt_counter;
    while (fast_node != slow_node) {
        if (g.times[fast_node] > g.times[slow_node]) {
            ++fast_len;
            fast_node = g.previous[fast_node];
        } else if (g.times[fast_node] < g.times[slow_node]) {
            ++slow_len;
            slow_node = g.previous[slow_node];
        } else if (is_previous_to_node(g, slow_node, fast_node)) {
            while (fast_node != slow_node) {
                ++fast_len;
                fast_node = g.previous[fast_node];
            }
        } else if (is_previous_to_node(g, fast_node, slow_node)) {
            while (slow_node != fast_node) {
                ++slow_len;
                slow_node = g.previous[slow_node];
            }
        } else {
            ++fast_len;
            fast_node = g.previous[fast_node];
            ++slow_len;
            slow_node = g.previous[slow_node];
        }
        if (fast_node < 0 || slow_node < 0) return;
        if (slow_len > g.MAXNODELENGTH || fast_len > g.MAXNODELENGTH)
            return;
    }
    if (fast_len == 0) return;

    // fast path: [ancestor .. destination]; slow: [ancestor .. origin,
    // destination]
    std::vector<int32_t> fast(fast_len + 1), slow(slow_len + 2);
    fast[fast_len] = destination;
    for (int i = fast_len - 1; i >= 0; --i)
        fast[i] = g.previous[fast[i + 1]];
    slow[slow_len + 1] = destination;
    slow[slow_len] = origin;
    for (int i = slow_len - 1; i >= 0; --i)
        slow[i] = g.previous[slow[i + 1]];

    static uint8_t fseq[MAXREADLENGTH], sseq[MAXREADLENGTH];
    int fl = extract_sequence(g, fast, fseq);
    int sl = extract_sequence(g, slow, sseq);
    if (fl <= 0 || sl <= 0) return;
    ++g.cmp_counter;
    if (!compare_sequences(g, fseq, sseq, fl, sl)) return;
    clean_up(g, fast, slow);
}

// tourBusArc (bubble.c:1894-1959)
void tour_bus_arc(Graph &g, int32_t origin, int32_t destination,
                  int32_t arc_multi, double origin_time) {
    int32_t old_previous = g.previous[destination];
    if (old_previous == origin || g.multi[destination] == 1) return;
    double arc_time =
        arc_multi > 0 ? (double)g.length[origin] / (double)arc_multi : 0.0;
    double total = origin_time + arc_time;
    double dest_time = g.times[destination];
    if (dest_time == -1.0) {
        g.times[destination] = total;
        heap_insert(g, destination, total);
        g.previous[destination] = origin;
        return;
    } else if (dest_time > total) {
        if (!g.in_heap[destination]) return;  // already expanded
        heap_erase(g, destination, dest_time);
        heap_insert(g, destination, total);
        g.times[destination] = total;
        g.previous[destination] = origin;
        compare_paths(g, destination, old_previous);
        return;
    } else {
        if (dest_time == g.times[origin] &&
            is_previous_to_node(g, destination, origin))
            return;
        compare_paths(g, destination, origin);
    }
}

// tourBusNode (bubble.c:1961-2011)
void tour_bus_node(Graph &g, int32_t node) {
    g.expanded.push_back(node);
    int32_t outs[MAXCONNECTION];
    int32_t mults[MAXCONNECTION];
    int n = 0;
    for (auto &kv : g.arcs[node]) {
        outs[n] = kv.first;
        mults[n] = kv.second;
        if (++n >= MAXCONNECTION) break;
    }
    g.has_changed = false;
    for (int i = 0; i < n; ++i) {
        int32_t mult = mults[i];
        if (g.has_changed) {  // re-fetch after graph surgery
            auto it = g.arcs[node].find(outs[i]);
            if (it == g.arcs[node].end()) continue;
            mult = it->second;
        }
        if (g.deleted[outs[i]]) continue;
        tour_bus_arc(g, node, outs[i], mult, g.times[node]);
    }
}

// tourBus (bubble.c:2028-2046)
void tour_bus(Graph &g, int32_t start) {
    g.times[start] = 0.0;
    g.previous[start] = start;
    int32_t cur = start;
    while (cur >= 0) {
        g.in_heap[cur] = 0;
        tour_bus_node(g, cur);
        if (g.heap.empty()) break;
        auto it = g.heap.begin();
        cur = it->second;
        g.heap.erase(it);
        g.in_heap[cur] = 0;
    }
}

}  // namespace

extern "C" {

// Runs bubblePinch; mutates cvg/deleted in place and rewrites the arc
// COO (must have capacity arc_cap rows).  Returns the new arc count,
// or -1 if the surviving arcs exceed arc_cap.  counters[0..2] =
// pairs backtracked / sequences compared / pairs merged.
int64_t tourbus_run(int32_t n_edges, const int32_t *length, int32_t *cvg,
                    const int32_t *twin, uint8_t *deleted,
                    const int64_t *seq_off, const uint8_t *seq_pool,
                    int32_t n_arcs, int32_t *arc_from, int32_t *arc_to,
                    int32_t *arc_mult, int32_t arc_cap, int32_t k,
                    int32_t merge_level, int32_t max_edge_cov,
                    int64_t *counters) {
    Graph g;
    g.n_edges = n_edges;
    g.length = length;
    g.cvg = cvg;
    g.twin = twin;
    g.deleted = deleted;
    g.seq_off = seq_off;
    g.seq_pool = seq_pool;
    g.max_edge_cov = max_edge_cov;
    g.overlaplen = k;
    g.cutoff = 1.0 - 0.9;
    if (merge_level <= 1) {
        g.MAXNODELENGTH = 3;
        g.DIFF = 2;
    } else if (merge_level == 2) {
        g.MAXNODELENGTH = 9;
        g.DIFF = 3;
    } else {
        g.MAXNODELENGTH = 30;
        g.DIFF = 10;
    }

    g.arcs.assign(n_edges, {});
    for (int32_t i = 0; i < n_arcs; ++i) {
        int32_t f = arc_from[i], t = arc_to[i];
        if (f < 0 || t < 0 || f >= n_edges || t >= n_edges) continue;
        if (deleted[f] || deleted[t] || arc_mult[i] <= 0) continue;
        g.arcs[f][t] += arc_mult[i];
    }

    g.times.assign(n_edges, -1.0);
    g.previous.assign(n_edges, -1);
    g.in_heap.assign(n_edges, 0);
    reset_node_status(g);

    // Starting-point scan.  The reference scans ascending edge ids
    // (nextStartingPoint, bubble.c:279-309) and masks every node a
    // tour reaches (updateNodeStatus), so bubbles upstream of an
    // arbitrary mid-component start are silently missed — an
    // edge-id-order artifact we cannot (and should not) reproduce.
    // Deterministic replacement: source edges (in-degree 0) first so
    // each tour sweeps a component from its head, then the ascending
    // scan for leftovers; iterate the whole pass to fixpoint (merges
    // are gated by the NW identity check, so extra rounds only catch
    // what masking hid, cf. the reference's single HasChanged-driven
    // rescan inside tourBusNode).
    for (int round = 0; round < 4; ++round) {
        int64_t merged_before = g.pin_counter;
        std::vector<int32_t> order;
        order.reserve(n_edges);
        for (int32_t e = 0; e < n_edges; ++e) {
            bool has_in = false;
            for (auto &kv : g.arcs[tw(g, e)]) {
                if (kv.first != e) { has_in = true; break; }
            }
            if (!has_in) order.push_back(e);
        }
        for (int32_t e = 0; e < n_edges; ++e) order.push_back(e);
        reset_node_status(g);
        std::fill(g.times.begin(), g.times.end(), -1.0);
        std::fill(g.previous.begin(), g.previous.end(), -1);
        for (int32_t start : order) {
            if (g.deleted[start] || g.length[start] < 1) continue;
            if (g.multi[start] > 0) continue;
            g.expanded.clear();
            tour_bus(g, start);
            for (int32_t e : g.expanded) {  // updateNodeStatus
                g.multi[e] = 1;
                g.multi[tw(g, e)] = 1;
            }
            // reset Dijkstra state only for touched nodes
            for (int32_t e : g.expanded) {
                g.times[e] = -1.0;
                g.previous[e] = -1;
            }
            for (auto &p : g.heap) {
                g.times[p.second] = -1.0;
                g.previous[p.second] = -1;
                g.in_heap[p.second] = 0;
            }
            g.heap.clear();
        }
        if (g.pin_counter == merged_before) break;
    }

    int64_t w = 0;
    for (int32_t f = 0; f < n_edges; ++f) {
        if (deleted[f]) continue;
        for (auto &kv : g.arcs[f]) {
            if (deleted[kv.first]) continue;
            if (w >= arc_cap) return -1;
            arc_from[w] = f;
            arc_to[w] = kv.first;
            arc_mult[w] = kv.second;
            ++w;
        }
    }
    counters[0] = g.bt_counter;
    counters[1] = g.cmp_counter;
    counters[2] = g.pin_counter;
    return w;
}
}
