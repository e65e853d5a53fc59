// Incremental segment-level pinch graph (host-side C++ core).
//
// Role of the reference's stPinchGraphs submodule (consumed via
// caf/inc/stCaf.h:12-14): threads are sequences, pinches identify two
// oriented intervals base-for-base, and the graph maintains the induced
// segmentation + homology blocks incrementally.  Memory is O(segments),
// not O(bases) — the property that lets CAF reach chromosome scale.
//
// This is an original implementation (not a translation): segments live
// in one growable arena addressed by index; per-thread ordering is a
// std::map from start position to segment index; blocks are member
// vectors with per-segment orientation signs and event summaries kept
// up to date for the per-pinch alignment-filter policies
// (reference semantics: caf/impl/filtering.c — filterByOutgroup :41,
// filterByMultipleSpecies :139, filterByMultipleSequences :133,
// filterByRepeatSpecies :158; applied per maximally-aligned piece as in
// stCaf_anneal).
//
// Exposed via ctypes (no pybind11 in the image); see native/build.py.

#include <algorithm>
#include <cstdint>
#include <map>
#include <vector>

namespace {

typedef int64_t i64;
typedef int32_t i32;

struct Segment {
    i32 thread;
    i32 block;     // -1 = unaligned (degree-1 blocks not materialized)
    i64 start;
    i64 len;
    int8_t ori;    // orientation within block (+1/-1); +1 when unaligned
};

struct Block {
    std::vector<i32> members;   // segment indices
    i64 support;                // # pinch pieces that landed on this block
    i32 first_event;
    uint8_t multi_event;        // >1 distinct events present
    i32 n_outgroup;             // # members from outgroup events
    uint8_t dead;               // tombstone after merge
};

// Per-pinch alignment-filter policies (0 = none).
enum FilterMode {
    FILTER_NONE = 0,
    FILTER_MULTIPLE_SEQUENCES = 1,   // filtering.c:133
    FILTER_MULTIPLE_SPECIES = 2,     // filtering.c:139
    FILTER_OUTGROUP = 3,             // filtering.c:41 (singleCopyOutgroup)
    FILTER_REPEAT_SPECIES = 4,       // filtering.c:158 (singleCopy)
    FILTER_RELAXED_OUTGROUP = 5,     // filtering.c:62
    FILTER_RELAXED_REPEAT_SPECIES = 6,
    FILTER_SINGLE_COPY_EVENT = 7,    // filtering.c:181 (singleCopyEvent:X)
    FILTER_SINGLE_COPY_CHR = 8,      // filtering.c:214 (per-sequence copy)
    FILTER_SINGLE_COPY_INGROUP = 9,  // filtering.c:239
    FILTER_RELAXED_SINGLE_COPY_INGROUP = 10,  // filtering.c:244
    FILTER_HGVM = 11,  // filtering.c:323 (cycle-free isolated components)
};

struct PinchGraph {
    std::vector<Segment> segs;
    std::vector<Block> blocks;
    std::vector<std::map<i64, i32>> threads;  // start -> segment idx
    std::vector<i64> thread_len;
    std::vector<i32> thread_event;
    std::vector<uint8_t> event_outgroup;      // indexed by event id
    i64 n_live_blocks = 0;
    // Evidence dropped as orientation-contradictory (palindromic folds of
    // an existing block, and reverse self-pinch center bases).  These are
    // exactly the cases where this graph diverges from a naive per-base
    // CC (which would fold block columns onto their mirror).
    i64 n_conflicts = 0;
    // singleCopyEvent:X target (filtering.c:170-178: missing event ->
    // filtering disabled, matching stCaf_setSingleCopyEvent's critical-log
    // fallback).
    i32 filter_event = -1;
    // hgvm:X state (filtering.c:255-306): per-thread union-find of
    // applied pinches; "special" threads (the named event's non-_alt
    // sequences) must stay in their own cycle-free components.
    bool hgvm_on = false;
    std::vector<i32> uf_parent;           // thread -> parent (UF)
    std::vector<i32> uf_size;
    std::vector<uint8_t> thread_special;  // per thread
    std::vector<uint8_t> comp_special;    // valid at UF roots

    i32 uf_find(i32 t) {
        while (uf_parent[t] != t) {
            uf_parent[t] = uf_parent[uf_parent[t]];
            t = uf_parent[t];
        }
        return t;
    }

    i32 seg_at(i32 thread, i64 pos) const {
        const auto &m = threads[thread];
        auto it = m.upper_bound(pos);
        --it;
        return it->second;
    }

    i64 seg_end(i32 si) const { return segs[si].start + segs[si].len; }

    // Split an unaligned segment at local offset (0 < off < len).
    void split_plain(i32 si, i64 off) {
        Segment s = segs[si];
        i32 ri = (i32)segs.size();
        segs.push_back({s.thread, -1, s.start + off, s.len - off, 1});
        segs[si].len = off;
        threads[s.thread][s.start + off] = ri;
    }

    // Split every member of a block at block-column offset (0 < off < L),
    // producing two aligned blocks (stPinch block-split semantics: the
    // members stay base-for-base aligned on both sides of the cut).
    //
    // Orientation bookkeeping: member physical offset o maps to column o
    // (ori +1) or L-1-o (ori -1).  Cutting at column `off` cuts member
    // physics at off (ori +1) or L-off (ori -1); for ori -1 the PHYSICAL
    // left piece carries columns [off, L) and so belongs to the new
    // (right-columns) block.
    void split_block(i32 bi, i64 off) {
        std::vector<i32> old_members = blocks[bi].members;
        i64 L = segs[old_members[0]].len;
        if (off <= 0 || off >= L) return;
        i32 nbi = (i32)blocks.size();
        blocks.push_back({{}, blocks[bi].support, blocks[bi].first_event,
                          blocks[bi].multi_event, blocks[bi].n_outgroup, 0});
        std::vector<i32> left_cols, right_cols;
        left_cols.reserve(old_members.size());
        right_cols.reserve(old_members.size());
        for (i32 si : old_members) {
            Segment s = segs[si];  // copy: push_back below invalidates refs
            i64 cut = s.ori == 1 ? off : L - off;
            i32 ri = (i32)segs.size();
            segs.push_back({s.thread, -1, s.start + cut, s.len - cut, s.ori});
            segs[si].len = cut;
            threads[s.thread][s.start + cut] = ri;
            if (s.ori == 1) {
                segs[si].block = bi;
                segs[ri].block = nbi;
                left_cols.push_back(si);
                right_cols.push_back(ri);
            } else {
                segs[si].block = nbi;
                segs[ri].block = bi;
                left_cols.push_back(ri);
                right_cols.push_back(si);
            }
        }
        blocks[bi].members.swap(left_cols);
        blocks[nbi].members.swap(right_cols);
        n_live_blocks++;
    }

    // Guarantee a segment boundary at (thread, pos).
    void ensure_boundary(i32 thread, i64 pos) {
        if (pos <= 0 || pos >= thread_len[thread]) return;
        i32 si = seg_at(thread, pos);
        const Segment &s = segs[si];
        if (s.start == pos) return;
        i64 off = pos - s.start;
        if (s.block < 0) {
            split_plain(si, off);
        } else {
            i64 col = s.ori == 1 ? off : s.len - off;
            split_block(s.block, col);
        }
    }

    bool in_block(i32 si) const { return segs[si].block >= 0; }

    bool side_multi_event(i32 si) const {
        if (segs[si].block < 0) return false;
        return blocks[segs[si].block].multi_event != 0;
    }

    bool side_has_outgroup(i32 si) const {
        const Segment &s = segs[si];
        if (s.block < 0) return event_outgroup[thread_event[s.thread]] != 0;
        return blocks[s.block].n_outgroup > 0;
    }

    void side_events(i32 si, std::vector<i32> &out) const {
        out.clear();
        const Segment &s = segs[si];
        if (s.block < 0) {
            out.push_back(thread_event[s.thread]);
            return;
        }
        for (i32 mi : blocks[s.block].members) {
            i32 e = thread_event[segs[mi].thread];
            if (std::find(out.begin(), out.end(), e) == out.end())
                out.push_back(e);
        }
    }

    bool events_intersect(i32 sa, i32 sb) const {
        std::vector<i32> ea, eb;
        side_events(sa, ea);
        side_events(sb, eb);
        for (i32 e : ea)
            if (std::find(eb.begin(), eb.end(), e) != eb.end()) return true;
        return false;
    }

    // Event sets restricted to ingroup events (filtering.c:221-237).
    void side_ingroup_events(i32 si, std::vector<i32> &out) const {
        out.clear();
        const Segment &s = segs[si];
        if (s.block < 0) {
            i32 e = thread_event[s.thread];
            if (!event_outgroup[e]) out.push_back(e);
            return;
        }
        for (i32 mi : blocks[s.block].members) {
            i32 e = thread_event[segs[mi].thread];
            if (!event_outgroup[e]
                && std::find(out.begin(), out.end(), e) == out.end())
                out.push_back(e);
        }
    }

    bool ingroup_events_intersect(i32 sa, i32 sb) const {
        std::vector<i32> ea, eb;
        side_ingroup_events(sa, ea);
        side_ingroup_events(sb, eb);
        for (i32 e : ea)
            if (std::find(eb.begin(), eb.end(), e) != eb.end()) return true;
        return false;
    }

    // Thread (== sequence) sets intersect (filtering.c:197-218: the
    // singleCopyChr policy compares sequence names; threads ARE the
    // sequences in this model).
    bool threads_intersect(i32 sa, i32 sb) const {
        std::vector<i32> ta, tb;
        side_threads(sa, ta);
        side_threads(sb, tb);
        for (i32 t : ta)
            if (std::find(tb.begin(), tb.end(), t) != tb.end()) return true;
        return false;
    }

    void side_threads(i32 si, std::vector<i32> &out) const {
        out.clear();
        const Segment &s = segs[si];
        if (s.block < 0) {
            out.push_back(s.thread);
            return;
        }
        for (i32 mi : blocks[s.block].members) {
            i32 t = segs[mi].thread;
            if (std::find(out.begin(), out.end(), t) == out.end())
                out.push_back(t);
        }
    }

    bool side_contains_event(i32 si, i32 e) const {
        const Segment &s = segs[si];
        if (s.block < 0) return thread_event[s.thread] == e;
        for (i32 mi : blocks[s.block].members)
            if (thread_event[segs[mi].thread] == e) return true;
        return false;
    }

    // Any member thread of si's side is an HGVM special thread
    // (filtering.c:308-322).
    bool side_has_special(i32 si) const {
        const Segment &s = segs[si];
        if (s.block < 0) return thread_special[s.thread] != 0;
        for (i32 mi : blocks[s.block].members)
            if (thread_special[segs[mi].thread]) return true;
        return false;
    }

    // HGVM filter: reject pinches bridging two distinct special
    // components or folding a cycle inside one; otherwise UNION the
    // thread components (the applied-pinch component tracking of
    // filtering.c:323-359 — reference updates state inside the filter
    // because a false return always means the pinch is applied).
    bool hgvm_rejects(i32 sa, i32 sb) {
        i32 ca = uf_find(segs[sa].thread);
        i32 cb = uf_find(segs[sb].thread);
        bool spa = comp_special[ca] != 0, spb = comp_special[cb] != 0;
        if (spa && spb && ca != cb) return true;  // bridges two specials
        if (spa && spb && side_has_special(sa) && side_has_special(sb))
            return true;  // cycle within one special component
        // applied: merge components
        if (ca != cb) {
            if (uf_size[ca] < uf_size[cb]) std::swap(ca, cb);
            uf_parent[cb] = ca;
            uf_size[ca] += uf_size[cb];
            comp_special[ca] = (uint8_t)(spa || spb);
        }
        return false;
    }

    bool filter_rejects(i32 mode, i32 sa, i32 sb) {
        switch (mode) {
        case FILTER_NONE:
            return false;
        case FILTER_MULTIPLE_SEQUENCES:
            return in_block(sa) && in_block(sb);
        case FILTER_MULTIPLE_SPECIES:
            return side_multi_event(sa) && side_multi_event(sb);
        case FILTER_OUTGROUP:
            return side_has_outgroup(sa) && side_has_outgroup(sb);
        case FILTER_RELAXED_OUTGROUP:
            return in_block(sa) && in_block(sb) && side_has_outgroup(sa)
                   && side_has_outgroup(sb);
        case FILTER_REPEAT_SPECIES:
            return events_intersect(sa, sb);
        case FILTER_RELAXED_REPEAT_SPECIES:
            return in_block(sa) && in_block(sb) && events_intersect(sa, sb);
        case FILTER_SINGLE_COPY_EVENT:
            return filter_event >= 0
                   && side_contains_event(sa, filter_event)
                   && side_contains_event(sb, filter_event);
        case FILTER_SINGLE_COPY_CHR:
            return threads_intersect(sa, sb);
        case FILTER_SINGLE_COPY_INGROUP:
            return ingroup_events_intersect(sa, sb);
        case FILTER_RELAXED_SINGLE_COPY_INGROUP:
            return in_block(sa) && in_block(sb)
                   && ingroup_events_intersect(sa, sb);
        case FILTER_HGVM:
            return hgvm_on && hgvm_rejects(sa, sb);
        }
        return false;
    }

    void block_add_member(i32 bi, i32 si, int8_t ori) {
        Block &b = blocks[bi];
        Segment &s = segs[si];
        s.block = bi;
        s.ori = ori;
        b.members.push_back(si);
        i32 e = thread_event[s.thread];
        if (b.first_event < 0) b.first_event = e;
        else if (e != b.first_event) b.multi_event = 1;
        if (event_outgroup[e]) b.n_outgroup++;
    }

    i32 new_block() {
        blocks.push_back({{}, 0, -1, 0, 0, 0});
        n_live_blocks++;
        return (i32)blocks.size() - 1;
    }

    // Merge the blocks of two equal-length exact-segment pieces with
    // pinch-relative orientation rel (+1: same direction).
    void merge_pieces(i32 sa, i32 sb, int rel) {
        if (sa == sb) return;  // identity (palindromes resolved upstream)
        i32 ba = segs[sa].block, bb = segs[sb].block;
        if (ba >= 0 && ba == bb) {
            if (segs[sb].ori == segs[sa].ori * rel) {
                blocks[ba].support++;
            } else {
                // contradictory orientation fold of an existing block —
                // evidence dropped (stPinch no-ops same-block pinches;
                // the homology is inconsistent with prior evidence)
                n_conflicts++;
            }
            return;
        }
        if (ba < 0 && bb < 0) {
            i32 nb = new_block();
            block_add_member(nb, sa, 1);
            block_add_member(nb, sb, (int8_t)rel);
            blocks[nb].support++;
            return;
        }
        if (ba < 0) {
            block_add_member(bb, sa, (int8_t)(segs[sb].ori * rel));
            blocks[bb].support++;
            return;
        }
        if (bb < 0) {
            block_add_member(ba, sb, (int8_t)(segs[sa].ori * rel));
            blocks[ba].support++;
            return;
        }
        // two distinct blocks: fold the smaller into the larger.  Flip
        // factor f makes sa~rel~sb hold in the merged frame; f is
        // symmetric in the two sides, so it survives the swap.
        int f = segs[sa].ori * rel * segs[sb].ori;
        i32 dst = ba, src = bb;
        if (blocks[dst].members.size() < blocks[src].members.size())
            std::swap(dst, src);
        Block &d = blocks[dst];
        Block &s = blocks[src];
        for (i32 mi : s.members) {
            Segment &m = segs[mi];
            m.block = dst;
            m.ori = (int8_t)(f == 1 ? m.ori : -m.ori);
            d.members.push_back(mi);
            i32 e = thread_event[m.thread];
            if (d.first_event < 0) d.first_event = e;
            else if (e != d.first_event) d.multi_event = 1;
            if (event_outgroup[e]) d.n_outgroup++;
        }
        d.support += s.support + 1;
        s.members.clear();
        s.members.shrink_to_fit();
        s.dead = 1;
        n_live_blocks--;
    }

    // One pinch: t1 [p1, p1+len) aligns t2 [p2, p2+len); forward when
    // strand=+1, else t1's base p1+i pairs with t2's base p2+len-1-i.
    void pinch(i32 t1, i64 p1, i32 t2, i64 p2, i64 len, int strand,
               i32 filter_mode) {
        if (len <= 0) return;
        if (strand == -1 && t1 == t2 && p1 < p2 + len && p2 < p1 + len) {
            // reverse self-pinch with overlapping intervals (inverted
            // repeat folding onto itself): recursively halve until the
            // pieces no longer overlap; the 1-base center (a base paired
            // with itself reversed) carries no homology and is dropped
            if (len == 1) {
                n_conflicts++;
                return;
            }
            i64 h = len / 2;
            pinch(t1, p1, t2, p2 + len - h, h, -1, filter_mode);
            pinch(t1, p1 + h, t2, p2, len - h, -1, filter_mode);
            return;
        }
        i64 off = 0;
        while (off < len) {
            i64 a = p1 + off;
            i64 L = len - off;
            i32 sa = -1, sb = -1;
            // settle on a piece length both sides agree on: far-end cuts
            // can cascade through blocks and re-split the near side, so
            // iterate until both pieces are exact segments of length L
            while (true) {
                ensure_boundary(t1, a);
                sa = seg_at(t1, a);
                i64 ra = seg_end(sa) - a;
                i64 rb;
                if (strand == 1) {
                    ensure_boundary(t2, p2 + off);
                    sb = seg_at(t2, p2 + off);
                    rb = seg_end(sb) - (p2 + off);
                } else {
                    i64 b_end = p2 + len - off;
                    ensure_boundary(t2, b_end);
                    sb = seg_at(t2, b_end - 1);
                    rb = b_end - segs[sb].start;
                }
                i64 L2 = std::min(std::min(ra, rb), L);
                ensure_boundary(t1, a + L2);
                if (strand == 1)
                    ensure_boundary(t2, p2 + off + L2);
                else
                    ensure_boundary(t2, p2 + len - off - L2);
                sa = seg_at(t1, a);
                sb = strand == 1 ? seg_at(t2, p2 + off)
                                 : seg_at(t2, p2 + len - off - 1);
                if (segs[sa].len == L2 && segs[sb].len == L2
                    && segs[sa].start == a) {
                    L = L2;
                    break;
                }
                // a cascade split shrank one side: retry with the
                // smaller length (strictly decreasing -> terminates)
                L = std::min(segs[sa].len, segs[sb].len);
            }
            if (!filter_rejects(filter_mode, sa, sb))
                merge_pieces(sa, sb, strand);
            off += L;
        }
    }
};

}  // namespace

extern "C" {

void *pg_create(i64 n_threads, const i64 *lengths, const i32 *events,
                i64 n_events, const uint8_t *event_outgroup) {
    PinchGraph *g = new PinchGraph();
    g->threads.resize(n_threads);
    g->thread_len.assign(lengths, lengths + n_threads);
    g->thread_event.assign(events, events + n_threads);
    g->event_outgroup.assign(event_outgroup, event_outgroup + n_events);
    g->segs.reserve(4 * (size_t)n_threads);
    for (i64 t = 0; t < n_threads; t++) {
        if (lengths[t] <= 0) continue;
        i32 si = (i32)g->segs.size();
        g->segs.push_back({(i32)t, -1, 0, lengths[t], 1});
        g->threads[t][0] = si;
    }
    return g;
}

void pg_destroy(void *h) { delete (PinchGraph *)h; }

// singleCopyEvent:X — set the target event id (-1 = event absent from
// this problem: filtering stays off, the stCaf_setSingleCopyEvent
// critical-log fallback).
void pg_set_filter_event(void *h, i32 event_id) {
    ((PinchGraph *)h)->filter_event = event_id;
}

// hgvm:X — per-thread special flags (the named event's non-"_alt"
// sequences); initializes the thread component union-find.
void pg_setup_hgvm(void *h, const uint8_t *special) {
    PinchGraph *g = (PinchGraph *)h;
    i32 n = (i32)g->threads.size();
    g->uf_parent.resize(n);
    g->uf_size.assign(n, 1);
    for (i32 t = 0; t < n; t++) g->uf_parent[t] = t;
    g->thread_special.assign(special, special + n);
    g->comp_special.assign(special, special + n);
    g->hgvm_on = true;
}

// Batch pinch: arrays of (t1, p1, t2, p2, len, strand) applied in order,
// each trimmed by `trim` bases on both sides (the per-annealing-round
// diagonal trim; caf/impl/caf.c:380 stPinchIterator_setTrim semantics).
void pg_pinch_batch(void *h, i64 n, const i32 *t1, const i64 *p1,
                    const i32 *t2, const i64 *p2, const i64 *len,
                    const int8_t *strand, i32 filter_mode, i64 trim) {
    PinchGraph *g = (PinchGraph *)h;
    for (i64 i = 0; i < n; i++) {
        i64 L = len[i] - 2 * trim;
        if (L <= 0) continue;
        g->pinch(t1[i], p1[i] + trim, t2[i], p2[i] + trim, L,
                 strand[i] == 1 ? 1 : -1, filter_mode);
    }
}

i64 pg_n_segments(void *h) { return (i64)((PinchGraph *)h)->segs.size(); }
i64 pg_n_blocks(void *h) { return (i64)((PinchGraph *)h)->blocks.size(); }
i64 pg_n_conflicts(void *h) { return ((PinchGraph *)h)->n_conflicts; }

// Export the segmentation: per segment (thread, start, len, block, ori)
// and per block the support count (dead blocks export -1).
void pg_export(void *h, i64 *seg_thread, i64 *seg_start, i64 *seg_len,
               i64 *seg_block, int8_t *seg_ori, i64 *block_support) {
    PinchGraph *g = (PinchGraph *)h;
    for (size_t i = 0; i < g->segs.size(); i++) {
        const Segment &s = g->segs[i];
        seg_thread[i] = s.thread;
        seg_start[i] = s.start;
        seg_len[i] = s.len;
        seg_block[i] = s.block;
        seg_ori[i] = s.ori;
    }
    for (size_t b = 0; b < g->blocks.size(); b++)
        block_support[b] = g->blocks[b].dead ? -1 : g->blocks[b].support;
}

}  // extern "C"
