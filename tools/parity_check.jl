# Julia side of the cross-framework parity harness (BASELINE.md item 2).
#
# Loads a `parity_case.npz` produced by `python tools/parity_harness.py emit`,
# rebuilds the identical single GNBlock in GraphNets.jl with the dumped
# weights, runs the forward pass, and asserts the activations match the
# JAX framework's dump in BOTH directions (ours vs Julia's, per graph).
#
# This image has no Julia runtime, so run this wherever GraphNets.jl is
# installed:
#
#     julia --project=. tools/parity_check.jl parity_case.npz
#
# Dependencies: GraphNets v0.1.7, Flux 0.14, NPZ.
#
# Layout mapping (see tools/parity_harness.py docstring): the JAX side is
# feature-LAST (`[T, D]` rows), Julia/Flux is channel-FIRST (`(D, T, B)`), so
# every feature array transposes; weights are already dumped in Flux layout
# (`W :: (out, in)` acting on column vectors). Edge order is identical on
# both sides: column-major linear index of the adjacency
# (GraphNets.jl src/pad.jl:30 == graphnets_tpu/graph.py `_adj_to_coo`).

using GraphNets
using Flux
using NPZ

function load_case(path)
    d = npzread(path)
    B = 0
    while haskey(d, "adj_$(B)")
        B += 1
    end
    @assert B > 0 "no adj_<b> arrays in $path"
    adj_mats = [Int.(d["adj_$(b-1)"]) for b in 1:B]
    # feature-last [T, D] -> channel-first (D, T)
    ef = [permutedims(Float32.(d["ef_in_$(b-1)"])) for b in 1:B]
    nf = [permutedims(Float32.(d["nf_in_$(b-1)"])) for b in 1:B]
    gf = permutedims(Float32.(d["gf_in"]))          # [B, DG] -> (DG, B)
    (; d, B, adj_mats, ef, nf, gf)
end

function build_block(d)
    W_edge = Float32.(d["W_edge"]); b_edge = Float32.(vec(d["b_edge"]))
    W_node = Float32.(d["W_node"]); b_node = Float32.(vec(d["b_node"]))
    W_graph = Float32.(d["W_graph"]); b_graph = Float32.(vec(d["b_graph"]))
    de_o = size(W_edge, 1); dn_o = size(W_node, 1); dg_o = size(W_graph, 1)
    # Recover input dims from the weight shapes:
    #   edge_in  = DE + 2 DN + DG      (src/gnblock.jl:50-54)
    #   node_in  = DN + DE' + DG
    #   graph_in = DN' + DE' + DG
    dg = size(W_graph, 2) - de_o - dn_o
    dn = size(W_node, 2) - de_o - dg
    de = size(W_edge, 2) - 2 * dn - dg
    @assert de >= 0 && dn >= 0 && dg >= 0 "inconsistent weight shapes"
    block = GNBlock((de, dn, dg) => (de_o, dn_o, dg_o))
    block.edgefn.layers[1].weight .= W_edge
    block.edgefn.layers[1].bias .= b_edge
    block.nodefn.layers[1].weight .= W_node
    block.nodefn.layers[1].bias .= b_node
    block.graphfn.layers[1].weight .= W_graph
    block.graphfn.layers[1].bias .= b_graph
    (; block, dims_in=(de, dn, dg), dims_out=(de_o, dn_o, dg_o))
end

function check(path; rtol=1f-5, atol=1f-5)
    case = load_case(path)
    (; block, dims_in, dims_out) = build_block(case.d)
    println("case: $(case.B) graphs, GNBlock $(dims_in) => $(dims_out)")

    x = (graphs=case.adj_mats, ef=case.ef, nf=case.nf, gf=case.gf) |> batch
    y = block(x) |> unbatch

    isok(a, b) = all(isapprox.(a, b; rtol, atol))
    maxerr(a, b) = maximum(abs.(a .- b); init=0f0)
    fails = String[]
    for b in 1:case.B
        # unbatch (heterogeneous) returns per-graph channel-first views;
        # the dump is feature-last -> transpose ours for comparison.
        ef_jl = Array(y.ef[b])                      # (DE', E_b)
        nf_jl = Array(y.nf[b])                      # (DN', N_b)
        ef_py = permutedims(Float32.(case.d["ef_out_$(b-1)"]))
        nf_py = permutedims(Float32.(case.d["nf_out_$(b-1)"]))
        isok(ef_jl, ef_py) ||
            push!(fails, "graph $b ef: max|Δ| = $(maxerr(ef_jl, ef_py))")
        isok(nf_jl, nf_py) ||
            push!(fails, "graph $b nf: max|Δ| = $(maxerr(nf_jl, nf_py))")
    end
    gf_jl = reduce(hcat, [Array(v) for v in y.gf])  # (DG', B)
    gf_py = permutedims(Float32.(case.d["gf_out"]))
    isok(gf_jl, gf_py) ||
        push!(fails, "gf: max|Δ| = $(maxerr(gf_jl, gf_py))")

    if isempty(fails)
        println("parity ok: all activations within rtol=$rtol atol=$atol")
    else
        foreach(println, fails)
        error("parity FAILED: $(length(fails)) mismatching activation sets")
    end
end

if abspath(PROGRAM_FILE) == @__FILE__
    isempty(ARGS) && error("usage: julia tools/parity_check.jl <case.npz>")
    check(ARGS[1])
end
