package graft
import graft.ops.Fuzz
import graft.ops.Fuzz._
object FuzzInventory {
  /** Expression-level tags — today just the VARIANT round trip, which
    * lives inside expressions rather than plan nodes. */
  def exOps(e: Ex): Set[String] = e match {
    case VarE(a) => exOps(a) + "variant"
    case AMod(a, _) => exOps(a)
    case Bin(_, a, b) => exOps(a) ++ exOps(b)
    case NullIfE(a, b) => exOps(a) ++ exOps(b)
    case CoalE(a, b) => exOps(a) ++ exOps(b)
    case IfE(p, t, el) => prOps(p) ++ exOps(t) ++ exOps(el)
    case UpperE(a) => exOps(a)
    case SubstrE(a, _, _) => exOps(a)
    case ConcatE(a, b) => exOps(a) ++ exOps(b)
    case LenE(a) => exOps(a)
    case CastD(a) => exOps(a)
    case _ => Set.empty
  }
  def prOps(p: Pr): Set[String] = p match {
    case Cmp(_,a,b) => exOps(a)++exOps(b)+"cmp"
    case IsNull(a,_) => exOps(a)+"isnull"
    case AndP(a,b) => prOps(a)++prOps(b)+"and"
    case OrP(a,b) => prOps(a)++prOps(b)+"or"
    case NotP(a) => prOps(a)+"not"
    case NsEq(a,b,_) => exOps(a)++exOps(b)+"nseq"
    case InP(a,_) => exOps(a)+"in"
    case LikeP(a,_) => exOps(a)+"like"
  }
  private def agName(a: Ag): String = a match {
    case _: AvgL => "avg"; case _: SumL => "sum"
    case _: CntD => "cntd"; case _: SumCase => "sumcase"
    case _ => "aggf"
  }
  def ops(p: Pl): Set[String] = p match {
    case _: Scan => Set("scan")
    case Proj(in,outs) =>
      ops(in)+"proj"++outs.flatMap(o => exOps(o._2)).toSet
    case Filt(in,pr) => ops(in)+"filt"++prOps(pr)
    case FiltSub(in,a,_,sub) => ops(in)++ops(sub)++exOps(a)+"filtsub"
    case Agg(in,_,aggs) => ops(in)+"agg"++aggs.map(x=>agName(x._2)).toSet
    case Roll(in,_,aggs,cube,gid) =>
      ops(in)+(if (cube) "cube" else "rollup")++
        (if (gid.isDefined) Set("gid") else Set.empty[String])++
        aggs.map(x=>agName(x._2)).toSet
    case CollAgg(in,_,_,aggs) =>
      ops(in)+"coll_agg"++aggs.map(x=>agName(x._2)).toSet
    case Jn(l,r,_,_,jt) => ops(l)++ops(r)+("join_"+jt)
    case Dist(in) => ops(in)+"distinct"
    case Wnd(in,_,f,_,_,_,_) => ops(in)+("wnd_"+f)
    case Expl(in,_,a,b) => ops(in)++exOps(a)++exOps(b)+"explode"
    case Lim(in,_) => ops(in)+"limit"
    case UnionA(l,r) => ops(l)++ops(r)+"union"
    case SetOp(l,r,o) => ops(l)++ops(r)+("set_"+o)
  }
  def main(args: Array[String]): Unit =
    (args(0).toInt to args(1).toInt).foreach { s =>
      println(f"[inv] $s%03d ${ops(Fuzz.gen(s.toLong)).toSeq.sorted.mkString(",")}")
    }
}
